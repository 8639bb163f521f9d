"""JSON-RPC serving layer: the host-process analog of the reference's wasm
deployment surface (crates/fugue-wasm/src/lib.rs:1-14). Service-level tests
drive the dict API; one HTTP round-trip test exercises the real server."""

import json
import os
import urllib.request

import numpy as np
import pytest

from fugue_tpu.serve import FugueService, serve

COIN = (
    'let p <- sample("p", beta(2.0, 2.0));'
    'for i in 0..10 { observe(("y", i), bernoulli(p), flips[i]); }'
    'return p;'
)


@pytest.fixture()
def svc():
    return FugueService(seed=0)


def _call(svc, method, **params):
    out = svc.handle({"method": method, "params": params, "id": 1})
    assert "error" not in out, out
    assert out["id"] == 1
    return out["result"]


def _compile_coin(svc):
    res = _call(svc, "compile", source=COIN,
                data={"flips": [1, 1, 1, 0, 1, 1, 0, 1, 0, 1]})
    assert res["dim"] == 1
    assert res["sites"][0]["address"] == "p"
    assert len(res["observed"]) == 10
    assert res["warnings"] == []
    return res["model_id"]


def test_compile_and_mh_session(svc):
    mid = _compile_coin(svc)
    sid = _call(svc, "mh.new", model_id=mid, n_chains=8)["session_id"]
    for _ in range(40):
        out = _call(svc, "mh.step", session_id=sid, n=10)
    # posterior Beta(9, 5): mean 9/14
    hist = np.asarray(_call(svc, "mh.history", session_id=sid,
                            address="p")["values"])
    assert hist.shape == (400, 8)
    assert hist[200:].mean() == pytest.approx(9 / 14, abs=0.05)
    assert 0.0 < out["accept_rate"] <= 1.0


def test_hmc_session_with_trajectory(svc):
    mid = _compile_coin(svc)
    new = _call(svc, "hmc.new", model_id=mid, n_leapfrog=8)
    sid = new["session_id"]
    assert new["step_size"] > 0
    rec = _call(svc, "hmc.step", session_id=sid, recorded=True)
    assert len(rec["trajectory"]) == 8
    assert len(rec["hamiltonians"]) == 8
    out = _call(svc, "hmc.set", session_id=sid, n_leapfrog=4)
    assert out["n_leapfrog"] == 4
    rec = _call(svc, "hmc.step", session_id=sid, recorded=True)
    assert len(rec["trajectory"]) == 4


def test_smc_run_and_grid(svc):
    mid = _compile_coin(svc)
    res = _call(svc, "smc.run", model_id=mid, n_particles=1024)
    assert np.isfinite(res["log_evidence"])
    assert res["posterior_means"]["p"] == pytest.approx(9 / 14, abs=0.04)

    src = ('let mu <- sample("mu", normal(0.0, 2.0));'
           'let tau <- sample("tau", normal(0.0, 2.0)); return mu;')
    mid2 = _call(svc, "compile", source=src)["model_id"]
    g = _call(svc, "grid", model_id=mid2, x_address="mu", y_address="tau",
              x_range=[-2, 2], y_range=[-2, 2], resolution=16)
    z = np.asarray(g["log_joint"])
    assert z.shape == (16, 16)
    assert np.isfinite(z).all()


def test_pf_session(svc):
    sid = _call(svc, "pf.new", n_particles=256)["session_id"]
    est = None
    for y in (0.1, 0.3, 0.2, 0.4):
        est = _call(svc, "pf.observe", session_id=sid, y=y)
    assert abs(est["mean"] - 0.3) < 0.5
    assert est["ess"] > 10


def test_error_paths(svc):
    out = svc.handle({"method": "nope"})
    assert out["error"]["code"] == -32601
    out = svc.handle({"method": "mh.step", "params": {"session_id": "x"}})
    assert out["error"]["code"] == -32602
    out = svc.handle({"method": "compile", "params": {}})
    assert out["error"]["code"] == -32602
    # DSL soft errors surface as warnings, not crashes
    res = _call(svc, "compile",
                source='let x <- sample("x", normal(0.0, 1.0)); return nope;')
    assert res["model_id"]


def test_http_round_trip():
    httpd = serve(port=0, service=FugueService(), block=False)
    port = httpd.server_address[1]
    import threading

    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        body = json.dumps({
            "method": "compile", "id": 7,
            "params": {"source": COIN,
                       "data": {"flips": [1, 0, 1, 1]}},
        }).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            out = json.loads(resp.read())
        assert out["id"] == 7
        assert out["result"]["dim"] == 1
    finally:
        httpd.shutdown()


def test_js_client_methods_match_service():
    """docs/explorables/fugue_client.js (the browser client, closing the
    reference's wasm-bindings line) must only call RPC methods the service
    actually registers — and must cover the full non-introspection surface."""
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    js = open(os.path.join(repo, "docs", "explorables",
                           "fugue_client.js")).read()
    called = set(re.findall(r'this\.rpc\(\s*"([^"]+)"', js))
    svc = FugueService()
    registered = set(svc.methods)
    assert called <= registered, called - registered
    assert registered - called <= {"methods"}, registered - called
