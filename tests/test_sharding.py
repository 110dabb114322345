"""Multi-device correctness: domain-decomposed sweeps match single-device.

Runs on the 8-device virtual CPU mesh (conftest). GSPMD partitions the
stencil shifts into halo exchanges; results must be bitwise-close to the
unsharded run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fem_fct_pdeco_tpu.grid import Grid
from fem_fct_pdeco_tpu.models.chemotaxis import ChemotaxisModel
from fem_fct_pdeco_tpu.ops.linalg import SolverOpts
from fem_fct_pdeco_tpu.parallel import field_sharding, make_mesh, traj_sharding


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs multi-device")
def test_sharded_forward_matches_single_device():
    # multi-device runs use mesh-divisible node counts (scale-out grids are
    # chosen by the user; reference parity sizes run single-device)
    g = Grid(0.0, 1.0, 32)
    model = ChemotaxisModel(g, rescaling=1.0, solver_opts=SolverOpts(tol=1e-13))
    u0np, v0np = model.ic()
    dt, steps = 1e-3, 5
    c = jnp.full((steps + 1, g.n, g.n), 100.0)

    u_ref, v_ref = model.forward(c, jnp.asarray(u0np), jnp.asarray(v0np), dt)

    mesh = make_mesh(jax.devices()[:4])
    fs = field_sharding(mesh)
    ts = traj_sharding(mesh)
    u0s = jax.device_put(jnp.asarray(u0np), fs)
    v0s = jax.device_put(jnp.asarray(v0np), fs)
    cs = jax.device_put(c, ts)
    u_sh, v_sh = model.forward(cs, u0s, v0s, dt)

    np.testing.assert_allclose(np.asarray(u_sh), np.asarray(u_ref), rtol=1e-11, atol=1e-12)
    np.testing.assert_allclose(np.asarray(v_sh), np.asarray(v_ref), rtol=1e-11, atol=1e-12)
    # output really is sharded over the mesh
    assert len(u_sh.sharding.device_set) == 4


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
