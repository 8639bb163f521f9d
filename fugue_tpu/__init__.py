"""fugue-tpu: a TPU-native probabilistic-programming inference engine.

A brand-new JAX/XLA/Pallas implementation of the capabilities of the
``fugue`` PPL (monadic model DSL over 17 typed distributions, trace-based
replay/scoring runtime, adaptive MH / HMC / NUTS / tempered SMC / mean-field
VI / ABC, convergence diagnostics, conjugate validation harnesses) —
re-architected around staged array programs: models compile once into pure
log-density + sampler functions, inference kernels run jit-compiled with
chains/particles vectorized on-chip and sharded across device meshes.

The public API is re-exported flat here, mirroring the reference crate root
(reference: src/lib.rs:16-59).
"""

__version__ = "0.1.0"

# L0: errors
from .errors import (
    ErrorCategory,
    ErrorCode,
    ErrorContext,
    FugueError,
    ModelStructureError,
    StagingError,
    TraceAccessError,
    TypeMismatchError,
    ValidationError,
)

# L1: core — addresses, numerics, distributions, model language
from .core.address import Address, addr, scoped_addr
from .core.numerics import (
    log1p_exp,
    log_gamma,
    log_sum_exp,
    normalize_log_probs,
    safe_log,
    weighted_log_sum_exp,
)
from .core.distributions import (
    ALL_DISTRIBUTIONS,
    Bernoulli,
    Beta,
    Binomial,
    Categorical,
    Cauchy,
    ChiSquared,
    DiscreteUniform,
    Distribution,
    Exponential,
    Gamma,
    InverseGamma,
    Laplace,
    LogNormal,
    Normal,
    Poisson,
    StudentT,
    Support,
    Uniform,
    Weibull,
)
from .core.model import (
    Model,
    factor,
    guard,
    observe,
    plate,
    pure,
    sample,
    sequence_vec,
    traverse_vec,
)
from .core.rng import address_seed, chain_keys, site_key
from .core import transforms

# L3: runtime — handlers, interpreters, traces, staging
from .runtime.handler import Handler, run
from .runtime.interpreters import (
    PriorHandler,
    ReconcileReport,
    ReconcilingScoreGivenTrace,
    ReplayHandler,
    SafeReplayHandler,
    SafeScoreGivenTrace,
    ScoreGivenTrace,
    StrictScoreGivenTrace,
    ValuesHandler,
    score_given_trace,
    score_given_trace_reconciled,
    score_given_trace_safe,
    score_given_trace_strict,
)
from .runtime.trace import Choice, Trace
from .runtime.staging import LogDensityParts, Site, StagedModel, stage
