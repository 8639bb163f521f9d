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


def test_nuts_session_rpc():
    svc = FugueService()
    m = svc.handle({"method": "compile", "params": {
        "source": 'let mu <- sample("mu", normal(0.0, 2.0));'
                  'for i in 0..3 { observe(("y", i), normal(mu, 1.0), ys[i]); }'
                  'return mu;',
        "data": {"ys": [1.0, 1.2, 0.8]},
    }})
    mid = m["result"]["model_id"]
    s = svc.handle({"method": "nuts.new", "params": {
        "model_id": mid, "warmup": 30}})
    sid = s["result"]["session_id"]
    assert s["result"]["step_size"] > 0
    out = svc.handle({"method": "nuts.step", "params": {
        "session_id": sid, "recorded": True}})["result"]
    assert out["n_leapfrog"] == len(out["trajectory"])
    assert all(np.isfinite(h) for h in out["hamiltonians"])
    out2 = svc.handle({"method": "nuts.set", "params": {
        "session_id": sid, "step_size": 0.3}})["result"]
    assert out2["step_size"] == 0.3
    # a short run concentrates on the conjugate posterior mean 3.0/3.25
    vals = [svc.handle({"method": "nuts.step", "params": {
        "session_id": sid}})["result"]["position"][0] for _ in range(200)]
    assert abs(float(np.mean(vals[50:])) - 3.0 / 3.25) < 0.25


def test_chees_session_rpc():
    svc = FugueService()
    m = svc.handle({"method": "compile", "params": {
        "source": 'let mu <- sample("mu", normal(0.0, 2.0));'
                  'for i in 0..3 { observe(("y", i), normal(mu, 1.0), ys[i]); }'
                  'return mu;',
        "data": {"ys": [1.0, 1.2, 0.8]},
    }})
    mid = m["result"]["model_id"]
    s = svc.handle({"method": "chees.new", "params": {
        "model_id": mid, "n_chains": 32, "n_warmup": 150}})["result"]
    assert s["trajectory_length"] > 0
    out = svc.handle({"method": "chees.step", "params": {
        "session_id": s["session_id"], "n": 40}})["result"]
    assert len(out["positions"]) == 32
    # after 40 frozen-kernel steps the cloud sits on the posterior
    cloud = np.asarray(out["positions"]).ravel()
    assert abs(cloud.mean() - 3.0 / 3.25) < 0.3


def test_hmc_sharded_rpc():
    svc = FugueService()
    m = svc.handle({"method": "compile", "params": {
        "source": 'let mu <- sample("mu", normal(0.0, 2.0));'
                  'for i in 0..3 { observe(("y", i), normal(mu, 1.0), ys[i]); }'
                  'return mu;',
        "data": {"ys": [1.0, 1.2, 0.8]},
    }})
    mid = m["result"]["model_id"]
    out = svc.handle({"method": "hmc.sharded", "params": {
        "model_id": mid, "n_samples": 300, "n_warmup": 300}})["result"]
    assert out["n_devices"] == 8  # conftest's virtual CPU mesh
    summ = out["summaries"]["mu"]
    assert abs(summ["mean"][0] - 3.0 / 3.25) < 0.05
    assert summ["r_hat"][0] < 1.05


def test_vi_run_rpc(svc):
    """vi.run: one-shot VI from the serving surface. The coin model's
    posterior is Beta(9, 5) (mean 9/14 ≈ 0.643, sd ≈ 0.124); the mean-field
    Beta family should recover both from the variational draws."""
    mid = _compile_coin(svc)
    out = _call(svc, "vi.run", model_id=mid, n_iterations=600,
                posterior_draws=4096)
    post = out["posterior"]["p"]
    assert post["mean"][0] == pytest.approx(9 / 14, abs=0.04)
    assert post["sd"][0] == pytest.approx(0.1237, abs=0.04)
    assert out["n_iterations_run"] >= 1
    assert len(out["elbo_history"]) >= 2
    assert out["final_elbo"] == pytest.approx(out["elbo_history"][-1])
    assert out["guide"] == "meanfield"

    # full-rank ADVI reaches the same posterior through the logit transform
    fr = _call(svc, "vi.run", model_id=mid, guide="fullrank",
               n_iterations=600, posterior_draws=4096)
    assert fr["posterior"]["p"]["mean"][0] == pytest.approx(9 / 14, abs=0.05)

    err = svc.handle({"method": "vi.run", "params":
                      {"model_id": mid, "guide": "laplace"}})
    assert err["error"]["code"] == -32602


def test_live_explorable_source_compiles():
    """The model source EMBEDDED in docs/explorables/live.html must compile
    through the real service (r5: the shipped source used a '~' syntax the
    DSL never supported, so the live demo failed at connect)."""
    import html as html_mod
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    page = open(os.path.join(repo, "docs", "explorables", "live.html")).read()
    m = re.search(r'<pre id="src">(.*?)</pre>', page, re.S)
    assert m, "live.html must embed its model source in <pre id='src'>"
    source = html_mod.unescape(m.group(1))
    data_m = re.search(r"const DATA = (\{[^;]*\});", page)
    assert data_m
    data = json.loads(re.sub(r"(\w+):", r'"\1":', data_m.group(1)))
    svc = FugueService()
    out = svc.handle({"method": "compile",
                      "params": {"source": source, "data": data}})
    assert "result" in out, out
    assert out["result"]["dim"] == 1
