"""Multi-chip semantics on a virtual 8-device CPU mesh (SURVEY.md §4 item 4):
sharded batches must produce the same math as single-device, and the full
PPO train step must compile+run under shard_map with gradient psum."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from physicsvae_tpu.parallel.mesh import make_mesh, replicate, shard_batch


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_matmul_matches():
    mesh = make_mesh()
    x = np.random.default_rng(0).normal(size=(64, 32)).astype(np.float32)
    w = np.random.default_rng(1).normal(size=(32, 16)).astype(np.float32)
    xs = shard_batch(mesh, jnp.asarray(x))
    wr = replicate(mesh, jnp.asarray(w))
    y = jax.jit(lambda a, b: a @ b)(xs, wr)
    assert np.allclose(np.asarray(y), x @ w, atol=1e-4)


def test_psum_gradient_equals_global_gradient():
    """Data-parallel grad psum over shards == full-batch gradient (the DDPPO
    allreduce equivalence, SURVEY.md §2.3)."""
    try:
        from jax import shard_map as _sm
        def shard_map(f, mesh, in_specs, out_specs):
            return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                       check_vma=False)
    except ImportError:
        from jax.experimental.shard_map import shard_map as _sm
        def shard_map(f, mesh, in_specs, out_specs):
            return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                       check_rep=False)

    mesh = make_mesh()
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(64, 8)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))

    def loss(w, x, y):
        return jnp.mean((x @ w - y) ** 2)

    g_full = jax.grad(loss)(w, x, y)

    def sharded_grad(w, x, y):
        g = jax.grad(loss)(w, x, y)
        return jax.lax.pmean(g, "data")

    g_sh = jax.jit(shard_map(
        sharded_grad, mesh,
        in_specs=(P(), P("data"), P("data")), out_specs=P()))(w, x, y)
    assert np.allclose(np.asarray(g_sh), np.asarray(g_full), atol=1e-5)


@pytest.mark.slow
def test_multichip_dryrun():
    """The driver's dryrun path: full humanoid PPO train step on the mesh."""
    import __graft_entry__ as g
    g.dryrun_multichip(8)
