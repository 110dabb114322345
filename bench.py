"""Benchmark: chemotaxis FCT time steps/sec at 256^2 on TPU vs the CPU
reference implementation style.

Prints the headline JSON line
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}
as soon as the 256^2 stage completes (flushed — so a capture window that
closes mid-run still records the headline), then re-prints a cumulative
line after EACH optional large-grid/PDECO/dist stage. Every stage runs
against one global deadline (FEMFCT_BENCH_BUDGET_S, default 2400 s);
stages that no longer fit are skipped with an explicit note.

Baseline: the reference's hot path is SciPy SuperLU spsolve plus per-node
Python loops over sparse neighbor lists (helpers.py:1769-1872; SURVEY §3.1).
``_reference_style_step`` reproduces that cost model faithfully (same sparse
solves, same Python flux/limiter loops) on this machine's CPU, and the
result is cached in BENCH_BASELINE.json so repeat runs don't pay for it.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

GRID_N = 256
DT = 1e-3
STEPS_PER_CALL = 500  # long scans amortize the axon tunnel's per-call RPC cost
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json")


def _sync(out) -> float:
    """Force COMPLETION of a timed computation, not just dispatch.

    Through the axon TPU tunnel ``jax.block_until_ready`` returns at
    dispatch time (measured round 4: a 500-step 256^2 sweep "finished" in
    0.2 ms, ~700x faster than the hardware can run it), so every timed
    call must fetch a value that data-depends on the result. Fetching one
    scalar keeps the transfer overhead to a ~1 ms round trip, amortized
    over the hundreds of steps in each sweep."""
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf[(0,) * leaf.ndim])


def _model_256(backend="pallas_fused", quad_degree=4):
    import jax.numpy as jnp

    from fem_fct_pdeco_tpu.grid import Grid
    from fem_fct_pdeco_tpu.models.chemotaxis import ChemotaxisModel
    from fem_fct_pdeco_tpu.ops.linalg import SolverOpts

    g = Grid(0.0, 1.0, GRID_N)
    return ChemotaxisModel(
        g, rescaling=1.0, dtype=jnp.float32,
        solver_opts=SolverOpts(tol=1e-6, maxiter=200,
                               spectral=(backend == "xla")),
        backend=backend,  # whole-sweep VMEM-resident kernels by default
        quad_degree=quad_degree,
    )


def tpu_admissible_dt_steps_per_sec(dt: float = 5e-4) -> dict:
    """Headline-config variant at an M-matrix-admissible dt: the canonical
    256^2 dt=1e-3 horizon genuinely loses the low-order M-matrix row-sum
    property late in the 500-step run (the reference warns and continues,
    helpers.py:1784-1810); this variant shows the throughput AND a
    roundoff-level min-rowsum at dt=5e-4 (measured -3.8e-8, ~0.25% of the
    lumped-mass scale, vs -2.6e-5 at dt=1e-3) so the headline carries no
    silent invariant violation."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    model = _model_256()
    u0np, v0np = model.ic()
    u0 = jnp.asarray(u0np, dtype=jnp.float32)
    v0 = jnp.asarray(v0np, dtype=jnp.float32)
    c = jnp.full((STEPS_PER_CALL + 1, GRID_N, GRID_N), model.params.gamma,
                 jnp.float32)
    u, v = model.forward(c, u0, v0, dt)
    jax.block_until_ready((u, v))
    assert bool(jnp.isfinite(u).all()) and bool(jnp.isfinite(v).all())
    rep = model.invariant_report()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = model.forward(c, u0, v0, dt)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return {
        "admissible_dt": dt,
        "admissible_dt_forward_steps_per_sec": round(STEPS_PER_CALL / best, 3),
        **({"admissible_dt_min_rowsum": rep["min_rowsum"]} if rep else {}),
    }


def tpu_steps_per_sec(backend="pallas_fused") -> dict:
    """Forward and adjoint FCT sweep throughput at 256^2 f32 (pallas_fused
    whole-sweep kernels), with correctness guards so a silently-wrong kernel
    can't post a fast number."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    model = _model_256(backend)
    u0np, v0np = model.ic()
    u0 = jnp.asarray(u0np, dtype=jnp.float32)
    v0 = jnp.asarray(v0np, dtype=jnp.float32)
    c = jnp.full((STEPS_PER_CALL + 1, GRID_N, GRID_N), model.params.gamma, jnp.float32)

    # warmup + compile; guards: finiteness + FCT mass conservation (u has no
    # source, so lumped mass is conserved to solver tolerance)
    u, v = model.forward(c, u0, v0, DT)
    jax.block_until_ready((u, v))
    assert bool(jnp.isfinite(u).all()) and bool(jnp.isfinite(v).all())
    ML = model.ML_diag
    m0 = float(jnp.sum(ML * u[0]))
    mT = float(jnp.sum(ML * u[-1]))
    assert abs(mT - m0) / abs(m0) < 1e-3, (m0, mT)
    # always-on FCT telemetry (helpers.py:1784-1810 semantics): REPORT the
    # min low-order row sum rather than asserting positivity — the 256^2
    # dt=1e-3 config genuinely loses the M-matrix property late in the
    # 500-step horizon (the reference prints its admissible-dt warning and
    # continues; measured round 4: fused and XLA report the SAME violation
    # to 8 significant digits, a strong cross-backend validation of the
    # telemetry itself). Correctness is guarded by finiteness + mass
    # conservation above.
    rep = model.invariant_report()
    telemetry = {"min_rowsum": rep["min_rowsum"]} if rep else {}

    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        out = model.forward(c, u0, v0, DT)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    fwd_sps = STEPS_PER_CALL / best

    # adjoint sweep (the other half of PDECO wall-clock), fused on TPU
    uhat, vhat = 1.01 * u[-1], 1.02 * v[-1]
    p, q = model.adjoint(u, v, uhat, vhat, c, DT, "finaltime")
    jax.block_until_ready((p, q))
    assert bool(jnp.isfinite(p).all()) and bool(jnp.isfinite(q).all())
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        out = model.adjoint(u, v, uhat, vhat, c, DT, "finaltime")
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    adj_sps = STEPS_PER_CALL / best
    return {"forward_steps_per_sec": fwd_sps, "adjoint_steps_per_sec": adj_sps,
            **telemetry}


def tpu_fastquad_steps_per_sec() -> dict:
    """Forward sweep throughput at 256^2 f32 with the opt-in reduced
    quadrature (quad_degree=2, models/chemotaxis.py) on the fused kernels.
    The HEADLINE stays at the reference-parity degree-4 rule; this extra
    records what the fast path buys (fewer in-kernel exp evaluations). Same
    finiteness + mass-conservation guards as the headline."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    model = _model_256(quad_degree=2)
    u0np, v0np = model.ic()
    u0 = jnp.asarray(u0np, dtype=jnp.float32)
    v0 = jnp.asarray(v0np, dtype=jnp.float32)
    c = jnp.full((STEPS_PER_CALL + 1, GRID_N, GRID_N), model.params.gamma,
                 jnp.float32)
    u, v = model.forward(c, u0, v0, DT)
    jax.block_until_ready((u, v))
    assert bool(jnp.isfinite(u).all()) and bool(jnp.isfinite(v).all())
    ML = model.ML_diag
    m0 = float(jnp.sum(ML * u[0]))
    mT = float(jnp.sum(ML * u[-1]))
    assert abs(mT - m0) / abs(m0) < 1e-3, (m0, mT)
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        out = model.forward(c, u0, v0, DT)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return {"fastquad_forward_steps_per_sec": round(STEPS_PER_CALL / best, 3)}


def tpu_schnak_steps_per_sec() -> dict:
    """Schnakenberg coupled FCT sweep throughput at 256^2 f32 (the second
    model family's whole-sweep kernel, DCT-preconditioned)."""
    import jax
    import jax.numpy as jnp

    from fem_fct_pdeco_tpu.grid import Grid
    from fem_fct_pdeco_tpu.models.schnakenberg import SchnakenbergModel
    from fem_fct_pdeco_tpu.ops.linalg import SolverOpts

    g = Grid(0.0, 1.0, GRID_N)
    model = SchnakenbergModel(g, dtype=jnp.float32,
                              solver_opts=SolverOpts(tol=1e-6, maxiter=200),
                              backend="pallas_fused")
    u0np, v0np = model.ic()
    u0 = jnp.asarray(u0np, jnp.float32)
    v0 = jnp.asarray(v0np, jnp.float32)
    c = jnp.full((STEPS_PER_CALL + 1, GRID_N, GRID_N), model.params.c_a,
                 jnp.float32)
    u, v = model.forward(c, u0, v0, DT)
    jax.block_until_ready((u, v))
    assert bool(jnp.isfinite(u).all()) and bool(jnp.isfinite(v).all())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = model.forward(c, u0, v0, DT)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return {"schnak_forward_steps_per_sec": round(STEPS_PER_CALL / best, 3)}


def tpu_large_grid_steps_per_sec(n: int = 1024, steps: int = 50,
                                 include_fused: bool = True) -> dict:
    """Forward sweep throughput at 1024²: the synth fused whole-sweep
    kernel (in-kernel synthesized stationary operators, pallas_fused.py)
    vs the XLA fallback, with a fused-vs-XLA parity guard so a silently
    wrong kernel can't post a fast number. ``include_fused=False`` measures
    only the XLA path (the timeout fallback of
    ``_tpu_large_grid_with_timeout``)."""
    import jax
    import jax.numpy as jnp

    from fem_fct_pdeco_tpu.grid import Grid
    from fem_fct_pdeco_tpu.models.chemotaxis import ChemotaxisModel
    from fem_fct_pdeco_tpu.ops.linalg import SolverOpts

    g = Grid(0.0, 1.0, n)
    u0np, v0np = None, None
    out = {}

    from fem_fct_pdeco_tpu.ops.pallas_kernels import (
        fits_vmem, fits_vmem_lean, fits_vmem_synth, fits_vmem_xl)
    from fem_fct_pdeco_tpu.ops.pallas_xxl import fits_hbm_xxl

    if include_fused and not (fits_vmem(n) or fits_vmem_synth(n)
                              or fits_vmem_lean(n) or fits_vmem_xl(n)
                              or fits_hbm_xxl(n)):
        # single-block fused tier capped near 640^2 f32 by real-Mosaic
        # scoped-VMEM requirements (see fits_vmem_lean); report the XLA
        # number honestly instead of asserting on the routing fallback
        out["large_grid_fused_note"] = (
            f"{n}^2 exceeds the calibrated single-block VMEM cap; "
            "XLA path reported")
        include_fused = False

    def measure(backend, steps_b):
        nonlocal u0np, v0np
        # the XLA path gets the spectral-DCT preconditioner (the fused
        # kernels carry their own in-kernel variant)
        opts = SolverOpts(tol=1e-6, maxiter=200, spectral=(backend == "xla"))
        model = ChemotaxisModel(g, rescaling=1.0, dtype=jnp.float32,
                                solver_opts=opts, backend=backend)
        if u0np is None:
            u0np, v0np = model.ic()
        u0 = jnp.asarray(u0np, jnp.float32)
        v0 = jnp.asarray(v0np, jnp.float32)
        c = jnp.full((steps_b + 1, n, n), model.params.gamma, jnp.float32)
        u, v = model.forward(c, u0, v0, DT)
        jax.block_until_ready((u, v))
        assert bool(jnp.isfinite(u).all()) and bool(jnp.isfinite(v).all())
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            o = model.forward(c, u0, v0, DT)
            _sync(o)
            best = min(best, time.perf_counter() - t0)
        return model, (u, v), steps_b / best

    if include_fused:
        model_f, (uf, vf), sps_fused = measure("pallas_fused", steps)
        assert model_f.backend == "pallas_fused", model_f.backend
        # mass conservation over the FULL measured horizon + the always-on
        # min-rowsum telemetry — cheap, step-count-independent guards that
        # catch Mosaic-specific corruption the 5-step parity check can't
        MLf = model_f.ML_diag
        m0 = float(jnp.sum(MLf * uf[0]))
        mT = float(jnp.sum(MLf * uf[-1]))
        assert abs(mT - m0) / abs(m0) < 1e-3, (m0, mT)
        repf = model_f.invariant_report()
        if repf is not None:
            out[f"min_rowsum_{n}"] = repf["min_rowsum"]
        out[f"forward_steps_per_sec_{n}"] = round(sps_fused, 3)
    try:
        model_x, (ux, vx), sps_xla = measure("xla", steps)
        out[f"forward_steps_per_sec_{n}_xla"] = round(sps_xla, 3)
        if include_fused:
            # parity guard over the first 5 steps (f32 trajectories diverge
            # chaotically at long horizons; early steps must agree closely)
            rel = float(jnp.abs(uf[5] - ux[5]).max() / jnp.abs(ux[5]).max())
            assert rel < 1e-2, rel
            out[f"fused_vs_xla_rel_{n}"] = rel
    except Exception as e:
        out["large_grid_xla_error"] = f"{type(e).__name__}: {e}"
    return out


def tpu_large_grid_adjoint_steps_per_sec(n: int = 1024, steps: int = 50) -> dict:
    """Adjoint sweep throughput at 1024² — the other half of every PDECO
    iteration's wall-clock (helpers.py:599-698 semantics).

    The banded XL ADJOINT kernel does NOT fit real-Mosaic VMEM at 1024² f32
    (measured round 5: 138.06 MB scoped vs the 128 MB capacity, after a
    44-minute compile — fits_vmem_xl_adjoint), so the production adjoint at
    this size is the spectral-preconditioned XLA path, measured here on the
    trajectory produced by the FUSED forward sweep (the PDECO pairing)."""
    import jax
    import jax.numpy as jnp

    from fem_fct_pdeco_tpu.grid import Grid
    from fem_fct_pdeco_tpu.models.chemotaxis import ChemotaxisModel
    from fem_fct_pdeco_tpu.ops.linalg import SolverOpts

    g = Grid(0.0, 1.0, n)
    out = {}

    def mk(backend):
        opts = SolverOpts(tol=1e-6, maxiter=200, spectral=(backend == "xla"))
        return ChemotaxisModel(g, rescaling=1.0, dtype=jnp.float32,
                               solver_opts=opts, backend=backend)

    model = mk("pallas_fused")
    assert model.backend == "pallas_fused", model.backend
    u0np, v0np = model.ic()
    u0 = jnp.asarray(u0np, jnp.float32)
    v0 = jnp.asarray(v0np, jnp.float32)
    c = jnp.full((steps + 1, n, n), model.params.gamma, jnp.float32)
    u, v = model.forward(c, u0, v0, DT)
    jax.block_until_ready((u, v))
    uhat, vhat = 1.01 * u[-1], 1.02 * v[-1]
    mx = mk("xla")
    p, q = mx.adjoint(u, v, uhat, vhat, c, DT, "finaltime")
    jax.block_until_ready((p, q))
    assert bool(jnp.isfinite(p).all()) and bool(jnp.isfinite(q).all())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        o = mx.adjoint(u, v, uhat, vhat, c, DT, "finaltime")
        _sync(o)
        best = min(best, time.perf_counter() - t0)
    out[f"adjoint_steps_per_sec_{n}"] = round(steps / best, 3)
    out[f"adjoint_{n}_backend"] = (
        "xla_spectral (the banded XL adjoint needs 138.06 MB scoped VMEM "
        "at 1024^2 f32 — over the 128 MB capacity, measured on v5e; "
        "fits_vmem_xl_adjoint routes it here)")
    return out


# The 1024² synth kernels pay a large one-time Mosaic compile when
# /tmp/jax_cache is cold (hours through the axon remote-compile tunnel);
# never let the whole bench hang on it.
LG_FUSED_TIMEOUT_S = int(os.environ.get("FEMFCT_LG_FUSED_TIMEOUT_S", "2700"))


# ---------------------------------------------------------------------------
# Global time budget. Round 4's lesson: every stage was individually
# guarded but the SUM of the stage budgets exceeded the driver's capture
# window, so BENCH_r04.json recorded nothing (rc=124) despite every number
# existing. All orchestration below runs against ONE deadline, the headline
# JSON line is printed (and flushed) as soon as the 256^2 stage lands, and
# stages that no longer fit are skipped with an explicit note in the final
# (re-printed, enriched) JSON line.
BENCH_BUDGET_S = int(os.environ.get("FEMFCT_BENCH_BUDGET_S", "2400"))
_T_START = time.monotonic()


def _remaining() -> float:
    return BENCH_BUDGET_S - (time.monotonic() - _T_START)


def _bench_subprocess(flag: str, timeout_s: int, err_key: str) -> dict:
    """Run ``bench.py <flag>`` in a subprocess (keeping this process free of
    a live TPU client — two clients through the axon tunnel are not
    guaranteed to coexist) and return its last JSON stdout line."""
    import subprocess

    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), flag],
        capture_output=True, text=True, timeout=timeout_s,
    )
    for line in reversed((r.stdout or "").strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    tail = (r.stderr or "").strip().splitlines()[-3:]
    return {err_key: f"subprocess rc={r.returncode}: {tail}"}


def _stage(flag: str, cap_s: int, err_key: str, margin_s: int = 20) -> dict:
    """Budget-aware stage runner: the subprocess timeout is the smaller of
    the stage's own cap and the global remaining budget (minus a margin for
    emitting the final JSON); a stage that no longer fits is skipped with a
    note rather than silently starving everything after it."""
    import subprocess

    avail = int(_remaining()) - margin_s
    if avail < 45:
        return {err_key: (f"skipped: {avail}s left of the "
                          f"{BENCH_BUDGET_S}s FEMFCT_BENCH_BUDGET_S")}
    try:
        return _bench_subprocess(flag, min(cap_s, avail), err_key)
    except subprocess.TimeoutExpired:
        return {err_key: f"timed out after {min(cap_s, avail)}s "
                         f"(cap {cap_s}s, budget remainder {avail}s)"}


def _tpu_large_grid_with_timeout() -> dict:
    """Run the fused 1024² measurement in a timeout-guarded subprocess
    (compile-cache hits return in minutes; a cold cache is cut off at
    ``LG_FUSED_TIMEOUT_S`` or the remaining global budget), falling back to
    an XLA-path-only measurement — also in a subprocess, so the driver
    process never holds a TPU client. The fused attempt leaves ~300 s of
    the global budget on the table so a timeout still has room to record
    the XLA fallback number instead of starving it."""
    fused_cap = min(LG_FUSED_TIMEOUT_S, max(60, int(_remaining()) - 300))
    out = _stage("--large-grid-only", fused_cap, "large_grid_error")
    if "large_grid_error" in out and "timed out" in out["large_grid_error"]:
        fused_err = ("fused stage " + out["large_grid_error"]
                     + " (cold-cache mosaic compile?); XLA-path number "
                       "reported")
        out = _stage("--large-grid-xla-only",
                     int(os.environ.get("FEMFCT_XL_TIMEOUT_S", "1500")),
                     "large_grid_error")
        out["large_grid_fused_error"] = fused_err
    return out


def _tpu_xl_grid_with_timeout() -> dict:
    """2048² forward throughput in a timeout-guarded subprocess — the
    beyond-XL-budget scale point."""
    return _stage("--xl-grid-only",
                  int(os.environ.get("FEMFCT_XL_TIMEOUT_S", "1500")),
                  "xl_grid_error")


def tpu_dist_smoke(n: int = 256, steps: int = 50) -> dict:
    """Real-TPU smoke of the RDMA dist path on an nd=1 mesh: Mosaic must
    lower the remote-DMA descriptors, semaphore protocol and the
    distributed-transpose DCT machinery on actual hardware (the rest of the
    dist coverage runs in interpret mode on the CPU mesh); result is
    checked against the fused path."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from fem_fct_pdeco_tpu.grid import Grid
    from fem_fct_pdeco_tpu.models.chemotaxis import ChemotaxisModel
    from fem_fct_pdeco_tpu.ops.linalg import SolverOpts

    g = Grid(0.0, 1.0, n)
    mesh = Mesh(np.array(jax.devices()[:1]), ("x",))
    md = ChemotaxisModel(g, rescaling=1.0, dtype=jnp.float32,
                         solver_opts=SolverOpts(tol=1e-6, maxiter=200),
                         backend="pallas_dist", mesh=mesh)
    mf = ChemotaxisModel(g, rescaling=1.0, dtype=jnp.float32,
                         solver_opts=SolverOpts(tol=1e-6, maxiter=200),
                         backend="pallas_fused")
    u0np, v0np = md.ic()
    u0 = jnp.asarray(u0np, jnp.float32)
    v0 = jnp.asarray(v0np, jnp.float32)
    c = jnp.full((steps + 1, n, n), md.params.gamma, jnp.float32)
    ud, vd = md.forward(c, u0, v0, DT)
    jax.block_until_ready((ud, vd))
    assert bool(jnp.isfinite(ud).all()) and bool(jnp.isfinite(vd).all())
    uf, _ = mf.forward(c, u0, v0, DT)
    rel = float(jnp.abs(ud[5] - uf[5]).max() / jnp.abs(uf[5]).max())
    assert rel < 1e-2, rel
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        o = md.forward(c, u0, v0, DT)
        _sync(o)
        best = min(best, time.perf_counter() - t0)
    return {"dist_smoke_steps_per_sec": round(steps / best, 3),
            "dist_vs_fused_rel": rel}


def tpu_pdeco_wallclock(max_iter_gd: int = 5) -> dict:
    """Full 256^2 chemotaxis PDECO solve wall-clock (the reference's
    'Sim. duration' mechanism, Schnak_FCT_PDECO_refactored.py:250-251):
    inverse-crime target from the true control, PGD with Armijo re-solves,
    fused forward+adjoint sweeps. Guarded by a fused-vs-XLA cost comparison
    at 64^2 (same config, both backends on the TPU)."""
    import jax
    import jax.numpy as jnp

    from fem_fct_pdeco_tpu.grid import Grid
    from fem_fct_pdeco_tpu.models.chemotaxis import ChemotaxisModel
    from fem_fct_pdeco_tpu.ops.linalg import SolverOpts
    from fem_fct_pdeco_tpu.optimize import cost_functional
    from fem_fct_pdeco_tpu.optimize.pgd import PGDConfig, projected_gradient_descent

    T, beta = 0.1, 1e-4
    steps = round(T / DT)

    def solve(n, backend):
        g = Grid(0.0, 1.0, n)
        model = ChemotaxisModel(g, rescaling=1.0, dtype=jnp.float32,
                                solver_opts=SolverOpts(tol=1e-6, maxiter=200),
                                backend=backend)
        u0np, v0np = model.ic()
        u0 = jnp.asarray(u0np, jnp.float32)
        v0 = jnp.asarray(v0np, jnp.float32)
        ctrue = jnp.full((steps + 1, n, n), model.params.gamma, jnp.float32)
        uh, vh = model.forward(ctrue, u0, v0, DT)
        uhat, vhat = uh[-1], vh[-1]

        def solve_state(c):
            return model.forward(c, u0, v0, DT)

        def solve_adjoint(state, c):
            return model.adjoint(state[0], state[1], uhat, vhat, c, DT, "finaltime")

        def cost_fn(state, c):
            return cost_functional(state[0], uhat, c, DT, model.M, beta,
                                   "finaltime", var2_traj=state[1],
                                   var2_target=vhat)

        from fem_fct_pdeco_tpu.optimize.cost import l2_norm_sq_q

        cfg = PGDConfig(beta=beta, tol=1e-10, max_iter_gd=max_iter_gd,
                        max_iter_armijo=8, c_lower=0.0, c_upper=200.0, s0=1.0)
        # warm up compiles outside the timed region
        st0 = solve_state(jnp.zeros_like(ctrue))
        jax.block_until_ready(st0)
        jax.block_until_ready(solve_adjoint(st0, ctrue))
        t0 = time.perf_counter()
        res = projected_gradient_descent(
            config=cfg, c0=jnp.zeros_like(ctrue),
            solve_state=solve_state, solve_adjoint=solve_adjoint,
            descent_direction=lambda c, s, a: model.descent_direction(beta, c, s[0], a[1]),
            cost_fn=cost_fn,
            control_norm_sq=lambda c: l2_norm_sq_q(c, DT, model.M),
        )
        wall = time.perf_counter() - t0
        return res, wall

    # correctness guard at 64^2: fused and XLA paths must agree on the cost
    res_f, _ = solve(64, "pallas_fused")
    res_x, _ = solve(64, "xla")
    rel = abs(res_f.cost - res_x.cost) / max(abs(res_x.cost), 1e-30)
    assert rel < 5e-2, (res_f.cost, res_x.cost, rel)

    res, wall = solve(GRID_N, "pallas_fused")
    return {
        "pdeco_256_wallclock_s": round(wall, 3),
        "pdeco_256_iterations": res.iterations,
        "pdeco_256_final_cost": float(res.cost),
        "pdeco_guard_relcost_64": rel,
    }


def _reference_style_step(state, ops):
    """One coupled chemotaxis step in the reference's implementation style:
    scipy spsolve + per-node Python loops over neighbor lists."""
    import scipy.sparse as sp
    from scipy.sparse.linalg import spsolve

    u_n, v_n = state
    (M, ML_diag, Mat_v, A_u_fn, nbrs, N) = ops
    # v implicit solve
    rhs_v = M @ v_n + DT * (100.0 * M @ (u_n))
    v_np1 = spsolve(Mat_v, rhs_v)
    # u FCT step, reference style (helpers.py:1769-1872)
    A = A_u_fn(u_n, v_np1)
    # artificial diffusion from -A
    negA = -A.copy()
    negA.setdiag(0)
    D = -negA.minimum(0)
    D = D.maximum(D.T)
    D = D - sp.diags(np.ravel(D.sum(axis=1)))
    Low = sp.diags(ML_diag) + DT * (A - D)
    u_low = spsolve(Low.tocsr(), ML_diag * u_n)
    # ChebSI du/dt
    rhs_du = -A @ u_low
    Md = M.diagonal()
    ymid = np.zeros(N); yold = np.zeros(N); omega = 0.0
    rho = (2 - 0.5) / (2 + 0.5)
    Mdd = (0.5 + 2) / 2 * Md
    for k in range(1, 21):
        omega = 1 / (1 - rho**2 / 2) if k == 2 else 1 / (1 - omega * rho**2 / 4)
        r = rhs_du - M @ ymid
        ynew = omega * (r / Mdd + ymid - yold) + yold
        yold, ymid = ymid, ynew
    du_dt = ymid
    # flux assembly: the reference's per-node Python loop (helpers.py:1818)
    F = sp.lil_matrix((N, N))
    Ml = M.tolil()
    Dl = D.tolil()
    for i in range(N):
        for j in nbrs[i]:
            F[i, j] = Ml[i, j] * (du_dt[i] - du_dt[j]) + Dl[i, j] * (u_low[i] - u_low[j])
    F.setdiag(0)
    p_pos = np.ravel(F.maximum(0).sum(axis=1))
    p_neg = np.ravel(F.minimum(0).sum(axis=1))
    u_max = np.empty(N); u_min = np.empty(N)
    for i in range(N):
        vals = [u_low[j] for j in nbrs[i]]
        u_max[i] = max(vals); u_min[i] = min(vals)
    q_pos = u_max - u_low; q_neg = u_min - u_low
    r_pos = np.ones(N); r_neg = np.ones(N)
    m = p_pos != 0
    r_pos[m] = np.minimum(1, ML_diag[m] * q_pos[m] / (DT * p_pos[m]))
    m = p_neg != 0
    r_neg[m] = np.minimum(1, ML_diag[m] * q_neg[m] / (DT * p_neg[m]))
    Fc = F.tocoo()
    fbar = np.zeros(N)
    for i, j, f in zip(Fc.row, Fc.col, Fc.data):
        if f > 0:
            fbar[i] += min(r_pos[i], r_neg[j]) * f
        elif f < 0:
            fbar[i] += min(r_neg[i], r_pos[j]) * f
    u_np1 = u_low + DT * fbar / ML_diag
    return u_np1, v_np1


def cpu_baseline_steps_per_sec(measure_steps: int = 5) -> float:
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            d = json.load(f)
        # round-1 cache held a single un-warmed step; require >= 5
        if d.get("grid_n") == GRID_N and d.get("measured_steps", 0) >= 5:
            return d["steps_per_sec"]

    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    from fem_fct_pdeco_tpu.grid import Grid
    from fem_fct_pdeco_tpu.models.chemotaxis import ChemotaxisModel
    from fem_fct_pdeco_tpu.ops import stencil as st

    g = Grid(0.0, 1.0, GRID_N)
    model = ChemotaxisModel(g, rescaling=1.0)
    N = g.num_nodes
    M = st.to_scipy(np.asarray(model.M))
    K = st.to_scipy(np.asarray(model.K))
    ML_diag = np.asarray(model.ML_diag).ravel()
    p = model.params
    Mat_v = (M + DT * (p.Df * K + p.delta * M)).tocsc()

    # neighbor lists (reference find_node_neighbours semantics)
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    import oracles

    nbrs = oracles.neighbors(GRID_N)

    asm = model.asm

    def A_u_fn(u_n, v_np1):
        uq = asm.nodal_at_quad(jnp.asarray(u_n.reshape(GRID_N, GRID_N)), 4)
        Aa = asm.advective(
            asm.elem_grad(jnp.asarray(v_np1.reshape(GRID_N, GRID_N))),
            jnp.exp(-p.eta * uq), degree=4,
        )
        return st.to_scipy(np.asarray(p.Dm * model.K - p.chi * Aa))

    u0, v0 = model.ic()
    state = (u0.ravel(), v0.ravel())
    ops = (M.tocsr(), ML_diag, Mat_v, A_u_fn, nbrs, N)
    # warm one partial pass is unnecessary; measure directly
    t0 = time.perf_counter()
    for _ in range(measure_steps):
        state = _reference_style_step(state, ops)
    elapsed = time.perf_counter() - t0
    sps = measure_steps / elapsed
    with open(BASELINE_CACHE, "w") as f:
        json.dump(
            {"grid_n": GRID_N, "steps_per_sec": sps, "measured_steps": measure_steps,
             "seconds_per_step": elapsed / measure_steps}, f)
    return sps


def _baseline_cache_stale() -> bool:
    if not os.path.exists(BASELINE_CACHE):
        return True
    with open(BASELINE_CACHE) as f:
        d = json.load(f)
    return d.get("grid_n") != GRID_N or d.get("measured_steps", 0) < 5


def _tpu_reachable(wait_s: int | None = None) -> bool:
    """Probe the TPU backend in a bounded subprocess. The axon relay can be
    down (observed: hours); a process that initializes JAX then hangs forever
    in a silent retry loop, so the probe MUST be external and time-limited.
    Polls until the relay answers or ``wait_s`` elapses."""
    import subprocess

    # default cut from 900s to 120s (round 5): a long poll eats the global
    # budget that the actual measurements need; if the relay is down for
    # minutes it is usually down for hours
    deadline = time.monotonic() + (wait_s if wait_s is not None else int(
        os.environ.get("FEMFCT_RELAY_WAIT_S", "120")))
    while True:
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(len(jax.devices()))"],
                capture_output=True, text=True, timeout=180,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() >= deadline:
            return False
        time.sleep(60)


def headline_stage() -> dict:
    """The driver-scored measurement (256^2 fused forward + adjoint) plus
    the cheap admissible-dt variant, in ONE process so the axon init and
    model setup are paid once. Falls back to the XLA path if Mosaic rejects
    a kernel revision — a genuine on-device number either way."""
    try:
        sweep = tpu_steps_per_sec()
    except Exception as e:
        sweep = {
            **tpu_steps_per_sec(backend="xla"),
            "headline_backend": "xla_fallback",
            "headline_fused_error": f"{type(e).__name__}: {e}",
        }
    try:
        sweep.update(tpu_admissible_dt_steps_per_sec())
    except Exception as e:
        sweep["admissible_dt_error"] = f"{type(e).__name__}: {e}"
    return sweep


def extras_stage() -> dict:
    """Auxiliary TPU metrics (PDECO wall-clock, Schnakenberg sweep, dist
    smoke, reduced-quadrature sweep) in one process."""
    out = {}
    for name, fn in (("pdeco", tpu_pdeco_wallclock),
                     ("schnak", tpu_schnak_steps_per_sec),
                     ("dist_smoke", tpu_dist_smoke),
                     ("fastquad", tpu_fastquad_steps_per_sec)):
        try:
            out.update(fn())
        except Exception as e:
            out[f"{name}_error"] = f"{type(e).__name__}: {e}"
    return out


def _emit(value, base, extra):
    print(json.dumps({
        "metric": f"chemotaxis_fct_steps_per_sec_{GRID_N}x{GRID_N}",
        "value": round(value, 3),
        "unit": "steps/s",
        "vs_baseline": round(value / base, 2) if base and value else None,
        "extra": extra,
    }), flush=True)


def main():
    if not _tpu_reachable():
        # Emit a well-formed result rather than hanging the driver: the axon
        # TPU tunnel is down and no on-device measurement is possible.
        _emit(0.0, None, {"error": "axon TPU relay unreachable; no device "
                                   "measurement possible this run"})
        return
    # Baseline must run on the CPU backend, which can only be selected before
    # JAX initializes — measure it in a subprocess unless already cached
    # (BENCH_BASELINE.json is committed, so this normally costs nothing).
    if _baseline_cache_stale():
        import subprocess

        try:
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--baseline-only"],
                check=False, timeout=max(60, min(900, int(_remaining() // 2))),
            )
        except subprocess.TimeoutExpired:
            pass
    try:
        base = cpu_baseline_steps_per_sec() if not _baseline_cache_stale() \
            else None
    except Exception:
        base = None

    # --- Stage 1: the headline, FIRST, and print it the moment it lands ---
    sweep = _stage("--headline-only",
                   int(os.environ.get("FEMFCT_HEADLINE_TIMEOUT_S", "1200")),
                   "headline_error")
    value = sweep.pop("forward_steps_per_sec", 0.0)
    extra = dict(sweep)
    extra["note"] = ("headline stage; optional large-grid/PDECO/dist stages "
                     "follow and re-print a cumulative line after each")
    _emit(value, base, extra)
    extra.pop("note")

    # --- Optional stages, CHEAPEST EVIDENCE FIRST (a cold-cache Mosaic
    # compile of the fused 1024² kernels can eat an hour, so that gamble
    # runs last among the TPU stages), each bounded by the remaining global
    # budget; the cumulative JSON line is re-printed after EVERY stage so a
    # capture window closing mid-stage still records everything before it.
    def _after(stage_result):
        extra.update(stage_result)
        extra["budget_spent_s"] = round(time.monotonic() - _T_START, 1)
        _emit(value, base, extra)

    _after(_tpu_xl_grid_with_timeout())                   # 2048^2 XLA
    _after(_stage("--extras-only",                        # PDECO/schnak/dist
                  int(os.environ.get("FEMFCT_EXTRAS_TIMEOUT_S", "1200")),
                  "extras_error"))
    # The 1024^2 FUSED stage genuinely goes last: its cold-cache Mosaic
    # compile is ~27 min, far beyond every other stage's cold compile
    # (XXL's banded-fori structure compiles in ~4 min at 2048^2, the
    # 1024^2 adjoint rides the XLA path), so on a wiped cache it would
    # otherwise starve the cheap fused evidence behind it.
    _after(_stage("--xl-grid-fused-only",                 # 2048^2 XXL fused
                  int(os.environ.get("FEMFCT_XXL_TIMEOUT_S", "2700")),
                  "xl_grid_fused_error"))
    # Of the two remaining long cold compiles only one can fit a 2400 s
    # budget: the fused 1024^2 forward (~27 min cold) outranks the 1024^2
    # XLA adjoint (~15+ min cold) as evidence, so it goes first and the
    # adjoint stage records a skip note when the budget is spent.
    _after(_tpu_large_grid_with_timeout())                # 1024^2 fwd fused
    _after(_stage("--large-grid-adjoint-only",            # 1024^2 adjoint
                  int(os.environ.get("FEMFCT_LG_ADJ_TIMEOUT_S", "2700")),
                  "large_grid_adjoint_error"))


if __name__ == "__main__":
    if "--baseline-only" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
        cpu_baseline_steps_per_sec()
    elif "--large-grid-only" in sys.argv:
        import jax

        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        print(json.dumps(tpu_large_grid_steps_per_sec()))
    elif "--large-grid-xla-only" in sys.argv:
        import jax

        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        print(json.dumps(tpu_large_grid_steps_per_sec(include_fused=False)))
    elif "--xl-grid-only" in sys.argv:
        import jax

        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        print(json.dumps(
            tpu_large_grid_steps_per_sec(n=2048, steps=20,
                                         include_fused=False)))
    elif "--xl-grid-fused-only" in sys.argv:
        import jax

        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        print(json.dumps(
            tpu_large_grid_steps_per_sec(n=2048, steps=20,
                                         include_fused=True)))
    elif "--large-grid-adjoint-only" in sys.argv:
        import jax

        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        print(json.dumps(tpu_large_grid_adjoint_steps_per_sec()))
    elif "--headline-only" in sys.argv:
        import jax

        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        print(json.dumps(headline_stage()))
    elif "--extras-only" in sys.argv:
        import jax

        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        print(json.dumps(extras_stage()))
    else:
        main()
