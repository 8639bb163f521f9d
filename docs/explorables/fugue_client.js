/* fugue-tpu browser client: a ~100-line fetch wrapper over the serve.py
 * JSON-RPC surface (fugue_tpu/serve.py), closing the reference's
 * browser-bindings capability (crates/fugue-wasm/src/lib.rs:1-14) with the
 * REAL engines running host-side instead of a parallel JS implementation.
 *
 *   const fugue = new FugueClient("http://127.0.0.1:8700");
 *   const model = await fugue.compile("p ~ beta(2.0, 2.0); observe flips ~ bernoulli(p) = data.flips;", {flips: [1,1,0,1]});
 *   const mh = await fugue.mhNew(model.model_id, {n_chains: 8});
 *   const {values} = await fugue.mhStep(mh.session_id, 100);
 *
 * Every method returns the RPC "result" object or throws FugueRpcError.
 */
"use strict";

class FugueRpcError extends Error {
  constructor(code, message) {
    super(message);
    this.name = "FugueRpcError";
    this.code = code;
  }
}

class FugueClient {
  constructor(baseUrl = "http://127.0.0.1:8700") {
    this.baseUrl = baseUrl.replace(/\/$/, "");
    this._id = 0;
  }

  async rpc(method, params = {}) {
    const body = JSON.stringify({ method, params, id: ++this._id });
    const resp = await fetch(this.baseUrl + "/", {
      method: "POST",
      headers: { "Content-Type": "application/json" },
      body,
    });
    const out = await resp.json();
    if (out.error) throw new FugueRpcError(out.error.code, out.error.message);
    return out.result;
  }

  // -- model compilation (DSL subset; soft errors come back as warnings) --
  compile(source, data = null) {
    return this.rpc("compile", { source, data });
  }

  // -- incremental MH (wasm WasmMh analog) --
  mhNew(modelId, opts = {}) {
    return this.rpc("mh.new", { model_id: modelId, ...opts });
  }
  mhStep(sessionId, n = 1) {
    return this.rpc("mh.step", { session_id: sessionId, n });
  }
  mhHistory(sessionId, address) {
    return this.rpc("mh.history", { session_id: sessionId, address });
  }

  // -- incremental HMC with recorded trajectories (WasmHmc analog) --
  hmcNew(modelId, opts = {}) {
    return this.rpc("hmc.new", { model_id: modelId, ...opts });
  }
  hmcStep(sessionId, recorded = false) {
    return this.rpc("hmc.step", { session_id: sessionId, recorded });
  }
  hmcSet(sessionId, opts) {
    return this.rpc("hmc.set", { session_id: sessionId, ...opts });
  }

  // -- incremental NUTS with leaf-recorded trajectories (flagship engine;
  //    no wasm counterpart — the reference ships fixed-L HMC only) --
  nutsNew(modelId, opts = {}) {
    return this.rpc("nuts.new", { model_id: modelId, ...opts });
  }
  nutsStep(sessionId, recorded = false) {
    return this.rpc("nuts.step", { session_id: sessionId, recorded });
  }
  nutsSet(sessionId, opts) {
    return this.rpc("nuts.set", { session_id: sessionId, ...opts });
  }

  // -- ChEES-HMC chain-batch session (cross-chain learned trajectories) --
  cheesNew(modelId, opts = {}) {
    return this.rpc("chees.new", { model_id: modelId, ...opts });
  }
  cheesStep(sessionId, n = 1) {
    return this.rpc("chees.step", { session_id: sessionId, n });
  }

  // -- one-shot device-parallel HMC over the host's mesh --
  hmcSharded(modelId, opts = {}) {
    return this.rpc("hmc.sharded", { model_id: modelId, ...opts });
  }

  // -- one-shot variational inference (vi.rs engine; mean-field or
  //    full-rank ADVI with pathwise gradients) --
  viRun(modelId, opts = {}) {
    return this.rpc("vi.run", { model_id: modelId, ...opts });
  }

  // -- bootstrap particle filter (wasm pf.rs analog) --
  pfNew(opts = {}) {
    return this.rpc("pf.new", opts);
  }
  pfObserve(sessionId, y) {
    return this.rpc("pf.observe", { session_id: sessionId, y });
  }

  // -- one-shot tempered SMC (wasm_smc_run analog) --
  smcRun(modelId, opts = {}) {
    return this.rpc("smc.run", { model_id: modelId, ...opts });
  }

  // -- 2-D posterior log-joint grid (log_joint_grid analog) --
  grid(modelId, xAddress, yAddress, xRange, yRange, opts = {}) {
    return this.rpc("grid", {
      model_id: modelId,
      x_address: xAddress,
      y_address: yAddress,
      x_range: xRange,
      y_range: yRange,
      ...opts,
    });
  }
}

if (typeof module !== "undefined") {
  module.exports = { FugueClient, FugueRpcError };
}
