"""Shared model-layer infrastructure.

A *model* owns the PDE-specific pieces the reference keeps in per-model
solver functions (helpers.py:511-698, 881-1038, 1250-1581): parameters,
initial conditions, the forward state sweep, the adjoint sweep, and the
gradient equation. Sweeps are jit-compiled ``lax.scan`` loops over
:mod:`fem_fct_pdeco_tpu.timeloop`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fem_fct_pdeco_tpu.grid import Grid
from fem_fct_pdeco_tpu.ops import stencil as st
from fem_fct_pdeco_tpu.ops.assembly import P1Assembler
from fem_fct_pdeco_tpu.ops.linalg import SolverOpts


def _warn_backend_fallback(backend: str, why: str):
    """Loud notice that a requested fast backend silently cannot serve this
    configuration and the sweep will run the XLA path instead — mirrors the
    construction-time VMEM/mesh fallbacks (ModelBase.__init__) so a user
    benchmarking ``--backend pallas_fused`` never unknowingly measures XLA."""
    import warnings

    warnings.warn(
        f"backend={backend!r} has no kernel for this configuration "
        f"({why}); this sweep runs the XLA path",
        stacklevel=3,
    )


class ModelBase:
    """Holds the grid, assembler and stationary operators every model needs."""

    # Set by models whose fused whole-sweep kernels have a large-grid
    # "synth" variant (stationary operators synthesized in-kernel).
    _synth_capable: bool = False
    # ... and an even larger-grid "lean" variant (one resident stencil
    # buffer, raw flux matrix HBM-parked around the Krylov solve).
    _lean_capable: bool = False
    # ... and the banded "XL" tier (full-plane VMEM state slots + banded
    # solver-loop bodies; the >= 1024^2 single-chip kernels)
    _xl_capable: bool = False
    # ... and the HBM-streamed "XXL" tier (slot file + stencils in HBM,
    # banded VMEM staging; the >= 2048^2 single-chip kernels, forward only)
    _xxl_capable: bool = False
    # test hooks forcing the synth/lean/xl/xxl kernel tiers at any grid size
    force_synth = False
    force_lean = False
    force_xl = False
    force_xxl = False

    def _synth_blocked(self) -> bool:
        """Model-specific reason the synth/lean tiers don't apply (e.g. the
        Schnakenberg time-dependent-wind kernels carry their own in-kernel
        assembly). Default: never blocked."""
        return False

    def _xxl_blocked(self) -> bool:
        """Model-specific reason the XXL streamed tier doesn't apply (e.g.
        reaction hooks the streamed kernels don't carry). Default: never."""
        return False

    def _use_synth_sweep(self):
        """Pick the synth whole-sweep kernels when the resident ones exceed
        VMEM (the resident variants are slightly faster at small n)."""
        if self._synth_blocked():
            return False
        if (self.force_synth or self.force_lean or self.force_xl
                or self.force_xxl):
            return True
        from fem_fct_pdeco_tpu.ops.pallas_kernels import fits_vmem

        return not fits_vmem(self.grid.n, self.dtype)

    def _use_lean_sweep(self):
        """Pick the lean whole-sweep kernels when even the synth ones exceed
        VMEM (the synth variants are faster: resident D + mass)."""
        if self.force_lean:
            return True
        if self.force_synth or self.force_xl or self.force_xxl:
            return False
        from fem_fct_pdeco_tpu.ops.pallas_kernels import fits_vmem_synth

        return not fits_vmem_synth(self.grid.n, self.dtype)

    def _use_xl_sweep(self):
        """Pick the banded XL kernels when even the lean ones exceed the
        calibrated single-block VMEM requirement (fits_vmem_lean)."""
        if not getattr(self, "_xl_capable", False) or self._synth_blocked():
            return False
        if self.force_xl:
            return True
        if self.force_lean or self.force_synth or self.force_xxl:
            return False
        from fem_fct_pdeco_tpu.ops.pallas_kernels import (
            fits_vmem_lean, fits_vmem_xl)

        n = self.grid.n
        nb = max(2, n // 128)
        divisible = n % nb == 0 and (n // nb) % 8 == 0
        return (not fits_vmem_lean(n, self.dtype) and divisible
                and fits_vmem_xl(n, self.dtype))

    def _use_xxl_sweep(self):
        """Pick the HBM-streamed XXL kernels when even the XL slot file
        exceeds VMEM (fits_vmem_xl; >= 2048^2 f32). Forward sweeps only —
        adjoint sweeps at this scale use the XLA path."""
        if (not getattr(self, "_xxl_capable", False) or self._synth_blocked()
                or self._xxl_blocked()):
            return False
        if self.force_xxl:
            return True
        if self.force_lean or self.force_synth or self.force_xl:
            return False
        from fem_fct_pdeco_tpu.ops.pallas_kernels import fits_vmem_xl
        from fem_fct_pdeco_tpu.ops.pallas_xxl import fits_hbm_xxl

        n = self.grid.n
        nb = max(4, n // 64)
        divisible = n % nb == 0 and (n // nb) % 8 == 0
        return (not fits_vmem_xl(n, self.dtype) and divisible
                and fits_hbm_xxl(n, self.dtype))

    def __init__(
        self,
        grid: Grid,
        dtype=jnp.float64,
        solver_opts: SolverOpts | None = None,
        backend: str = "xla",
        pad_to: int | None = None,
        mesh=None,
        debug: bool = False,
    ):
        """``pad_to``: enlarge all operators and fields to a ``pad_to`` x
        ``pad_to`` grid with the extra cells masked out of every assembled
        form and identity rows added for the extra nodes. Restricted to the
        true ``grid.n`` x ``grid.n`` window, all results are EXACTLY those of
        the unpadded model (solver tolerance), while the padded shapes are
        divisible by a device mesh — this is how reference-sized grids
        (41/81/129 nodes) run sharded (parallel/padding.py). Inputs to the
        sweeps must be padded with ``parallel.pad_field``; XLA backend only.

        ``backend="pallas_dist"`` + ``mesh``: the multi-chip RDMA fast path
        (ops/pallas_dist.py) — forward sweeps run as one Pallas kernel per
        device over the mesh's first axis (n divisible by its size); other
        sweeps use the XLA path under GSPMD. Models without a distributed
        kernel treat it as "xla".

        ``debug=True``: replicate the reference's EVERY-STEP validation of
        the FCT low-order matrix's M-matrix row-sum property with
        admissible-dt-bound reporting (helpers.py:1784-1810) as in-sweep
        ``checkify`` checks; a violating dt raises ``JaxRuntimeError`` with
        the bounds in the message. Forces the XLA path (the fused kernels
        cannot carry checkify errors).
        """
        self.debug = debug
        if debug and backend != "xla":
            import warnings

            warnings.warn(
                "debug=True runs the in-sweep invariant checks, which only "
                "the XLA path supports; forcing backend='xla'", stacklevel=3)
            backend = "xla"
        self.grid = grid
        if dtype == jnp.float64 and not jax.config.jax_enable_x64:
            dtype = jnp.float32  # avoid per-op truncation warnings
        self.dtype = dtype
        if pad_to is not None and backend != "xla":
            import warnings

            warnings.warn(
                "padded grids run the XLA path (the fused kernels are "
                "single-device and unmasked); forcing backend='xla'",
                stacklevel=3,
            )
            backend = "xla"
        if backend in ("pallas", "pallas_fused"):
            from fem_fct_pdeco_tpu.ops.pallas_kernels import (
                fits_vmem, fits_vmem_lean, fits_vmem_synth, fits_vmem_xl)

            # models with synth whole-sweep kernels (in-kernel synthesized
            # stationary operators, pallas_fused.py) keep the fused path up
            # to the larger synth budget — and, for families that also have
            # the lean (HBM-parked raw A) or banded XL kernels, up to those
            # tiers' budgets
            from fem_fct_pdeco_tpu.ops.pallas_xxl import fits_hbm_xxl

            synth_ok = (backend == "pallas_fused" and self._synth_capable
                        and (fits_vmem_synth(grid.n, dtype)
                             or (getattr(self, "_lean_capable", False)
                                 and fits_vmem_lean(grid.n, dtype))
                             or (getattr(self, "_xl_capable", False)
                                 and fits_vmem_xl(grid.n, dtype))
                             or (getattr(self, "_xxl_capable", False)
                                 and not self._xxl_blocked()
                                 and fits_hbm_xxl(grid.n, dtype))))
            if not fits_vmem(grid.n, dtype) and not synth_ok:
                import warnings

                warnings.warn(
                    f"grid {grid.n}x{grid.n} ({dtype}) exceeds the "
                    f"single-block VMEM budget of the {backend!r} kernels; "
                    "falling back to backend='xla'",
                    stacklevel=3,
                )
                backend = "xla"
        if backend == "pallas_dist":
            if mesh is None:
                import warnings

                warnings.warn(
                    "backend='pallas_dist' needs a device mesh; "
                    "falling back to backend='xla'", stacklevel=3)
                backend = "xla"
            else:
                nd = mesh.shape[mesh.axis_names[0]]
                if grid.n % nd:
                    import warnings

                    warnings.warn(
                        f"grid n={grid.n} not divisible by mesh axis size "
                        f"{nd}; falling back to backend='xla'", stacklevel=3)
                    backend = "xla"
        self.mesh = mesh
        self.backend = backend
        self.pad_to = pad_to
        if pad_to is None:
            self.node_mask = None
            self.asm = P1Assembler(grid, dtype)
            self.M = self.asm.mass
            self.M_diag = self.asm.mass_diag
            self.ML_diag = self.asm.lumped_mass_diag
        else:
            import numpy as np

            assert pad_to >= grid.n, (pad_to, grid.n)
            a2p = grid.a1 + (pad_to - 1) * grid.h
            pgrid = Grid(grid.a1, a2p, pad_to)
            cmask = np.zeros((pad_to - 1, pad_to - 1))
            cmask[: grid.n - 1, : grid.n - 1] = 1.0
            self.asm = P1Assembler(pgrid, dtype, cell_mask=cmask)
            nmask = np.zeros((pad_to, pad_to))
            nmask[: grid.n, : grid.n] = 1.0
            self.node_mask = jnp.asarray(nmask, dtype=dtype)
            pad_id = 1.0 - self.node_mask  # identity rows for pad nodes
            self.M = self.asm.mass.at[4].add(pad_id)
            self.M_diag = self.M[4]
            self.ML_diag = self.asm.lumped_mass_diag + pad_id
        self.K = self.asm.stiffness
        self.solver_opts = solver_opts or SolverOpts()
        # Always-on FCT safety telemetry (helpers.py:1784-1810): after every
        # sweep, {"min_rowsum": <device scalar>} — the sweep-wide minimum
        # row sum of the FCT low-order matrices (must stay > 0 for the
        # M-matrix property) — or None on paths that don't report (dist).
        # Kept as a device array so stashing never forces a host sync; read
        # via invariant_report() / check_invariants(). ``_inv_accum``
        # min-accumulates across sweeps (lazily, device-side) so a PGD
        # iteration's many sweeps (Armijo trials, state, adjoint) can be
        # surfaced as ONE telemetry value via pop_invariants().
        self.last_invariants: dict | None = None
        self._inv_accum = None
        if self.solver_opts.spectral and pad_to is None:
            from fem_fct_pdeco_tpu.ops.pallas_fused import dct_matrix

            self.dctC = jnp.asarray(dct_matrix(grid.n), dtype=dtype)
        self._jit_cache: dict = {}

    # Operator attributes lifted to jit ARGUMENTS instead of being captured
    # as trace-time closure constants. Closed-over concrete arrays are
    # inlined into the lowered StableHLO as dense literals, so every sweep
    # program would otherwise grow by O(n²) bytes per operator — ~1 GB of
    # program text at 2048² f32, which the TPU compiler rejects outright
    # (and which bloats compile times and the compilation cache at every
    # size). Subclasses extend the tuple with their stationary operators;
    # matrices DERIVED from these (Mat2, γM, Mbase_*) must be computed
    # inside the traced closures so they stay traced.
    _HOISTED_OPS: tuple = ("M", "M_diag", "ML_diag", "K", "node_mask",
                           "dctC")

    # spectral-DCT preconditioning of the XLA-path Krylov solves: the DCT
    # matrix is a hoisted operator (an (n, n) closure constant would be
    # inlined into StableHLO as a dense literal); the dt-dependent inverse
    # modal eigenvalues are computed INSIDE the traced closures from (n,)
    # vectors (_spectral_prec).
    dctC = None

    def _spectral_prec(self, dt, diff_coef, mass_coef=1.0):
        """(C, ilam) for ``solve_stencil(prec=...)`` when
        ``solver_opts.spectral``, else None. ``ilam`` inverts the modal
        eigenvalues of P = mass_coef·h²·I + dt·diff_coef·K5 (the stiff
        stationary part; pallas_fused.dct_precond_ilam semantics), built
        in-trace so dt stays a per-step-builder constant. Disabled on
        padded grids (identity pad rows break the modal structure) and for
        diff_coef == 0, where P degenerates to a scaled identity — four MXU
        matmuls per iteration to apply what Jacobi does elementwise (e.g.
        the eps=0 solid-body drift configuration)."""
        if self.dctC is None or self.pad_to is not None or diff_coef == 0.0:
            return None
        n = self.grid.n
        h = self.grid.h
        mu = 2.0 - 2.0 * jnp.cos(
            jnp.pi * jnp.arange(n, dtype=self.dtype) / n)
        lam = (mass_coef * h * h
               + dt * diff_coef * (mu[:, None] + mu[None, :]))
        return (self.dctC, 1.0 / lam)

    def hoist_wrap(self, inner):
        """Wrap ``inner(*args)`` as ``wrapper(opvals, args)`` where
        ``opvals`` are the model's hoisted operators: during the trace the
        operator attributes are rebound to the traced arguments, so
        ``self.<name>`` reads inside inner's closures stay traced instead
        of being captured as constants. Returns ``(wrapper, opvals_fn)``;
        call the jitted wrapper as ``jfn(opvals_fn(), args)``."""
        names = tuple(nm for nm in self._HOISTED_OPS
                      if getattr(self, nm, None) is not None)

        def wrapper(opvals, args):
            saved = [getattr(self, nm) for nm in names]
            for nm, v in zip(names, opvals):
                setattr(self, nm, v)
            try:
                return inner(*args)
            finally:
                for nm, v in zip(names, saved):
                    setattr(self, nm, v)

        def opvals_fn():
            return tuple(getattr(self, nm) for nm in names)

        return wrapper, opvals_fn

    def _jitted(self, key, build):
        key = (key, self.debug)
        fn = self._jit_cache.get(key)
        if fn is None:
            wrapper, opvals_fn = self.hoist_wrap(build())
            if self.debug:
                from jax.experimental import checkify

                jfn = jax.jit(checkify.checkify(wrapper))

                def fn(*args):
                    err, out = jfn(opvals_fn(), args)
                    err.throw()
                    return out
            else:
                jfn = jax.jit(wrapper)

                def fn(*args):
                    return jfn(opvals_fn(), args)

            self._jit_cache[key] = fn
        return fn

    def _stash_invariants(self, stats):
        """``stats``: sweep-wide min FCT low-order row sum (device scalar;
        vmapped sweeps may carry batch dims — reduced at read time), or
        None when the path doesn't report. When the sweep itself runs under
        an OUTER trace (e.g. ``jax.grad`` through the FCT loop on the
        discrete-gradient path), the scalar is a tracer that must not
        escape — telemetry is skipped for that call."""
        if stats is not None and isinstance(stats, jax.core.Tracer):
            stats = None
        self.last_invariants = (
            None if stats is None else {"min_rowsum": stats})
        if stats is not None:
            s = jnp.min(stats)
            acc = self._inv_accum
            if acc is not None and isinstance(acc, jax.core.Tracer):
                acc = None  # a leaked accumulator from an outer trace
            self._inv_accum = (
                s if acc is None else jnp.minimum(acc, s))

    def _call_sweep(self, fn, *args):
        """Run a jitted sweep built on the (result, stats) contract: stash
        the telemetry, hand back the result unchanged. Dist sweeps running
        in TPU interpret mode are materialized before returning
        (pallas_dist._sync_interpret rationale: queuing dependent eager
        work while the interpreter's io_callbacks are in flight can
        deadlock the host executor; no-op on real TPU)."""
        res, stats = fn(*args)
        if self.backend == "pallas_dist":
            from fem_fct_pdeco_tpu.ops.pallas_dist import _sync_interpret

            _sync_interpret(res, stats)
        self._stash_invariants(stats)
        return res

    def invariant_report(self) -> dict | None:
        """Host-side view of the last sweep's telemetry (SYNCS): returns
        {"min_rowsum": float, "ok": bool, "reported": bool} or None.
        ``reported=False`` means no FCT step recorded (sentinel value) —
        e.g. a sweep with only implicit solves."""
        if self.last_invariants is None:
            return None
        from fem_fct_pdeco_tpu.ops.fct import STATS_SENTINEL

        v = float(jnp.min(self.last_invariants["min_rowsum"]))
        reported = v < STATS_SENTINEL / 2
        return {"min_rowsum": v, "ok": (v > 0.0) or not reported,
                "reported": reported}

    @staticmethod
    def _warn_invariant(rep):
        import warnings

        warnings.warn(
            "FCT low-order matrix lost the M-matrix row-sum property "
            f"(min row sum = {rep['min_rowsum']:.3e} <= 0): the time step "
            "is too large for this transport field; the limiter's "
            "positivity guarantee is void. Re-run with debug=True for the "
            "admissible dt bounds.",
            stacklevel=3)

    def check_invariants(self, warn: bool = True) -> dict | None:
        """Read the last sweep's telemetry and (by default) warn loudly on a
        violated M-matrix row-sum property — the production-path counterpart
        of the reference's unconditional per-step check with its admissible-dt
        message (helpers.py:1784-1810); run with debug=True for the hard
        checkify failure carrying the exact dt bounds."""
        rep = self.invariant_report()
        if warn and rep is not None and not rep["ok"]:
            self._warn_invariant(rep)
        return rep

    def pop_invariants(self, warn: bool = True) -> dict | None:
        """Report the MIN over every sweep since the last pop (one telemetry
        value per PGD iteration: Armijo trials + state + adjoint), then reset
        the accumulator. SYNCS. Same dict shape as invariant_report()."""
        acc = self._inv_accum
        self._inv_accum = None
        if acc is None:
            return None
        from fem_fct_pdeco_tpu.ops.fct import STATS_SENTINEL

        v = float(acc)
        reported = v < STATS_SENTINEL / 2
        rep = {"min_rowsum": v, "ok": (v > 0.0) or not reported,
               "reported": reported}
        if warn and not rep["ok"]:
            self._warn_invariant(rep)
        return rep

    def mass_apply(self, x: jnp.ndarray) -> jnp.ndarray:
        return st.apply(self.M, x)
