"""Throughput benchmark — stereo pairs/sec/chip at 512x960 (north star,
BASELINE.md).

Measures flagship (sdnet_mini_ext / MiniDSNetExt, densenet121, 1dcorr)
inference throughput on the available accelerator and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "pairs/sec/chip", "vs_baseline": N}

vs_baseline anchoring: the reference publishes no throughput (SURVEY.md §6)
and this environment has no CUDA, so the torch reference can only be
measured on CPU. We therefore report vs_baseline against a measured
torch-reference-CPU number when available (cached in
BASELINE_MEASURED.json), else 0.0. The honest GPU comparison will be
documented separately once a reference GPU figure exists.
"""
import json
import os
import sys
import threading
import time

H, W, BATCH = 512, 960, int(os.environ.get("PMT_BENCH_BATCH", "16"))
WARMUP, ITERS = 2, 8

# Wall-clock budget (s). Round 4's driver run hit its outer `timeout`
# (rc=124) before any JSON was printed — a degraded axon tunnel made the
# cold compile crawl and the process died silently. A daemon watchdog
# thread prints whatever has been measured so far and exits 0 at the
# budget, even if the main thread is stuck inside a blocking runtime RPC
# (a SIGALRM handler could not fire there; os._exit can).
BUDGET_S = float(os.environ.get("PMT_BENCH_BUDGET_S", "480"))
_T0 = time.monotonic()
_STATE = {"done": False, "phase": "init"}


def _remaining() -> float:
    return BUDGET_S - (time.monotonic() - _T0)


def _start_watchdog(out: dict):
    def watchdog():
        while not _STATE["done"]:
            if _remaining() <= 0:
                out["bench_error"] = (
                    f"watchdog: {BUDGET_S:.0f}s budget hit in phase "
                    f"{_STATE['phase']} (degraded tunnel / cold compile)"
                )
                print(json.dumps(out), flush=True)
                os._exit(0)
            time.sleep(2.0)

    threading.Thread(target=watchdog, daemon=True).start()


def measure_tpu(out: dict = None) -> float:
    """Headline inference throughput. Progressively records partial figures
    into ``out`` (the watchdog prints it on budget cutoff) and adapts the
    measurement windows to the remaining budget: a degraded tunnel gets a
    plain (RTT-polluted, conservative) figure rather than nothing."""
    out = out if out is not None else {}
    import jax
    import jax.numpy as jnp

    # executable cache: skips the (remote) compile on repeat runs. Threshold
    # 1s so even the model.init program is cached — on a degraded tunnel
    # (round 4's rc=124) every remote compile costs minutes, so every
    # program this script compiles must be servable from the cache.
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu import models
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.core import (
        PMTConfig,
    )

    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini_ext"
    cfg.model.backbone = "densenet"
    cfg.model.corr_type = "1dcorr"
    cfg.model.s2d_heads = os.environ.get("PMT_S2D", "1") != "0"
    model = models.get_network(cfg)

    key = jax.random.PRNGKey(0)
    left = jax.random.normal(key, (BATCH, H, W, 3), jnp.float32)
    right = jax.random.normal(key, (BATCH, H, W, 3), jnp.float32)
    # jit the whole init: eager flax init issues one tiny backend compile
    # PER initializer (~400 for densenet121), each paying a full tunnel
    # round-trip — on a degraded relay that alone exceeds the bench budget.
    variables = jax.jit(
        lambda k, l, r: model.init({"params": k}, l, r, train=False)
    )(key, left[:1], right[:1])

    if os.environ.get("PMT_BENCH_DTYPE", "bf16") == "bf16":
        # bf16 inference: params + activations in bfloat16 (MXU native);
        # module dtypes are inferred so the whole graph stays bf16.
        cast = lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, t
        )
        variables = cast(variables)
        left = left.astype(jnp.bfloat16)
        right = right.astype(jnp.bfloat16)

    # variables passed as an argument (NOT closed over): closure constants
    # are inlined into the MLIR one ir_constant at a time — minutes of
    # lowering for 8M params on this host — and poison the persistent-cache
    # key with parameter values.
    @jax.jit
    def fwd(variables, left, right):
        out = model.apply(variables, left, right, train=False)
        return out["seg2"], out["disp1"]

    import numpy as np

    # warmup / compile. Timer: host-transfer one element of the LAST output
    # instead of trusting block_until_ready — over the axon relay the latter
    # can return early (BENCH_NOTES round 1/3), inflating throughput.
    # RTT-cancelling delta: time ITERS dispatches and 3*ITERS dispatches
    # (each ending in one transfer) and divide the extra 2*ITERS by the
    # delta — the constant relay round-trip cancels, so a latency spike on
    # a degraded tunnel can't deflate the figure.
    for i in range(WARMUP):
        s, d = fwd(variables, left, right)
        np.asarray(d[0, 0, 0, :1])
        if _remaining() < 180:  # degraded tunnel: one warmup must do
            break
    # Window sizes: the delta must be dominated by compute, not by the
    # relay's RTT *variance* (seconds on a bad day) — 4*ITERS extra
    # dispatches ≈ 7s of device time at the round-3 rate.
    def record(v, timer):
        out["value"] = round(v, 3)
        out["timer"] = timer
        base = load_baseline()
        out["vs_baseline"] = round(v / base, 2) if base > 0 else 0.0

    t0 = time.perf_counter()
    for _ in range(ITERS):
        s, d = fwd(variables, left, right)
    np.asarray(d[0, 0, 0, :1])
    dt1 = time.perf_counter() - t0
    record(BATCH * ITERS / dt1, "plain-1-window (incl. one relay RTT)")
    if _remaining() < 120:  # no time for the wide window; keep the partial
        return out["value"]
    # wide window 9x so RTT variance between windows is a few % of the
    # delta (~15s of device time at the round-3 rate); shrink to 5x when
    # the budget is tight so the train phase still gets ITS wide window
    mult = 9 if _remaining() > 300 else 5
    t0 = time.perf_counter()
    for _ in range(mult * ITERS):
        s, d = fwd(variables, left, right)
    np.asarray(d[0, 0, 0, :1])
    dt9 = time.perf_counter() - t0
    if dt9 > 1.2 * dt1:
        record(BATCH * (mult - 1) * ITERS / (dt9 - dt1),
               "rtt-cancelling-delta")
    else:
        # an RTT spike landed in the FIRST window (dt1 >= dt_wide/1.2 is
        # impossible for real compute); use the larger window's plain rate
        record(BATCH * mult * ITERS / dt9,
               f"plain-{mult}-window (incl. one RTT)")
    return out["value"]


def measure_train(out: dict = None) -> dict:
    """Training-step throughput at the reference's training crop (256x512,
    batch 8, MultiTversky+OHEM stack — BASELINE.md config #3).

    Primary figure: SUSTAINED — K steps chained in one jit via lax.scan
    (batch rolled along dim 0 per iteration so nothing batch-dependent is
    loop-invariant), one host transfer at the end forcing the whole chain.
    That is both honest under the axon relay (block_until_ready returns
    early there) and what a loader-fed production loop dispatches; it
    matches the profiler's device time within 4% (BENCH_NOTES round 3b).
    Secondary: per-step host sync, which pays a full relay RTT every step.
    """
    out = out if out is not None else {}
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pmt_learning_for_semantic_segmentation_and_disparity_tpu import (
        models,
    )
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.core import (
        PMTConfig,
    )
    from pmt_learning_for_semantic_segmentation_and_disparity_tpu.training import (
        TrainState, build_optimizer, make_train_step,
    )

    th, tw, tb, iters = 256, 512, 8, 8
    cfg = PMTConfig()
    cfg.model.net = "sdnet_mini_ext"
    cfg.model.s2d_heads = os.environ.get("PMT_S2D", "1") != "0"
    cfg.loss.losses = ("cross_entropy", "lovasz_loss", "tversky_loss",
                       "ohm_loss")
    cfg.parallel.bf16 = os.environ.get("PMT_TRAIN_DTYPE", "bf16") == "bf16"
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 2, (tb, th, tw))
    batch = {
        "left": jnp.asarray(rng.standard_normal((tb, th, tw, 3),
                                                dtype=np.float32)),
        "right": jnp.asarray(rng.standard_normal((tb, th, tw, 3),
                                                 dtype=np.float32)),
        "seg": jnp.asarray(np.eye(2, dtype=np.float32)[labels]),
        "disp": jnp.asarray(rng.random((tb, th, tw, 1), dtype=np.float32)),
        "edges": jnp.zeros((tb, th, tw, 1), jnp.float32),
    }
    model = models.get_network(cfg)
    variables = jax.jit(
        lambda k1, k2, l: model.init({"params": k1, "dropout": k2},
                                     l, l, train=False)
    )(jax.random.PRNGKey(0), jax.random.PRNGKey(1), batch["left"][:1])
    tx = build_optimizer(cfg.optim, cfg.model.net, len(cfg.loss.losses), 100)
    state = TrainState.create(model.apply, variables["params"],
                              variables.get("batch_stats", {}), tx)
    step = make_train_step(cfg, model, mesh=None)
    key = jax.random.PRNGKey(0)

    # Primary figure first (sustained scan chain) so a budget cutoff still
    # records it; the per-step-sync secondary runs only with time to spare.
    #
    # RTT-cancelling delta timer: on a degraded relay a single host
    # round-trip costs seconds and would swamp one 16-step chain (measured
    # 8.9 "pairs/s" on a day the device itself was unchanged). Timing one
    # chained call vs three back-to-back calls and dividing the DELTA by
    # the two extra chains cancels the constant RTT: dispatch is async, so
    # the three executions pipeline on device and the final transfer pays
    # the same single round-trip as the one-call case.
    k_chain = 16
    def chain(st, b, k):
        def body(s, i):
            bi = {n: jnp.roll(v, i, axis=0) for n, v in b.items()}
            s, mm = step(s, bi, jax.random.fold_in(k, i))
            return s, mm["loss"]
        return jax.lax.scan(body, st, jnp.arange(k_chain))
    chain_j = jax.jit(chain, donate_argnums=(0,))
    state2, losses = chain_j(state, batch, key)  # compile + warm run
    float(losses[-1])
    t0 = time.perf_counter()
    state2, losses = chain_j(state2, batch, jax.random.fold_in(key, 1))
    lv = float(losses[-1])
    dt1 = time.perf_counter() - t0
    out["train_pairs_per_sec_per_chip_256x512"] = round(tb * k_chain / dt1, 3)
    out["train_onechain_pairs_per_sec"] = round(tb * k_chain / dt1, 3)
    out["train_loss_finite"] = bool(np.isfinite(lv))
    if _remaining() < 120:  # partial (one chain, incl. one relay RTT)
        return out
    # Wide second window: 12 chains (~20s of device time) so the RTT
    # *variance* between the two windows is <=5% of the delta — a 6-chain
    # delta measured 12-16% above the round-3 profiler rate when the RTT
    # difference between windows reached ~1s.
    n_wide = 12
    t0 = time.perf_counter()
    for i in range(2, 2 + n_wide):
        state2, losses = chain_j(state2, batch, jax.random.fold_in(key, i))
    lvw = float(losses[-1])
    dtw = time.perf_counter() - t0
    if dtw > 1.2 * dt1 * n_wide / 4:  # sanity: wide window must dominate
        sustained = tb * k_chain * (n_wide - 1) / (dtw - dt1)
    else:
        sustained = tb * k_chain * n_wide / dtw
    out["train_pairs_per_sec_per_chip_256x512"] = round(sustained, 3)
    out["train_loss_finite"] = bool(np.isfinite(lv) and np.isfinite(lvw))

    if _remaining() > 75:
        _STATE["phase"] = "train-stepsync"
        try:  # secondary figure: never let a relay error wipe the primaries
            # NOTE: must use state2 — the original `state` was DONATED to
            # chain_j's first call; reusing it surfaces as a backend
            # INVALID_ARGUMENT over the relay instead of jax's usual
            # "Array has been deleted".
            state2, m = step(state2, batch, key)  # compile
            float(m["loss"])
            t0 = time.perf_counter()
            for i in range(iters):
                state2, m = step(state2, batch, jax.random.fold_in(key, i))
                float(m["loss"])  # per-step host sync (relay early-return)
            dt = time.perf_counter() - t0
            out["train_stepsync_pairs_per_sec"] = round(tb * iters / dt, 3)
        except Exception as e:
            out["train_stepsync_error"] = repr(e)[:120]
    return out


def load_baseline() -> float:
    p = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BASELINE_MEASURED.json")
    if os.path.exists(p):
        with open(p) as f:
            return float(json.load(f).get("torch_cpu_pairs_per_sec", 0.0))
    return 0.0


def main():
    out = {
        "metric": "stereo_pairs_per_sec_per_chip_512x960",
        "value": 0.0,
        "unit": "pairs/sec/chip",
        "vs_baseline": 0.0,
    }
    _start_watchdog(out)
    _STATE["phase"] = "inference"
    measure_tpu(out)  # records value/vs_baseline progressively into out
    # Train adds two more cold compiles (~1-2 min over a healthy tunnel);
    # skip it rather than risk dying JSON-less if the budget is nearly gone.
    if os.environ.get("PMT_BENCH_TRAIN", "1") != "0":
        if _remaining() > 90:
            _STATE["phase"] = "train"
            for attempt in (1, 2):  # relay throws transient InvalidArgument
                try:
                    measure_train(out)  # records progressively into out
                    out.pop("train_error", None)
                    break
                except Exception as e:  # keep the headline metric robust
                    out["train_error"] = repr(e)[:200]
                    if _remaining() < 120:
                        break
        else:
            out["train_error"] = "skipped: <90s of bench budget left"
    _STATE["done"] = True
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
