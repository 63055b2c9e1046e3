"""Sharding tests on the 8-virtual-device CPU mesh (SURVEY.md §4
prescription #4): TP/DP-sharded forward must equal the single-device
forward, the cache shardings must compose with prefill/decode, and the
driver dry-run must pass end-to-end."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from evo_tpu import model as model_lib
from evo_tpu.config import tiny_config
from evo_tpu.parallel.mesh import make_mesh
from evo_tpu.parallel.sharding import (
    cache_shardings, data_sharding, param_shardings, shard_params)


@pytest.fixture(scope='module')
def setup():
    # channels (64) and heads (4) divisible by tp=4; batch by dp=2
    cfg = tiny_config()
    params = model_lib.init_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(dp=2, tp=4)
    return cfg, params, mesh


def test_param_shardings_cover_tree(setup):
    cfg, params, mesh = setup
    ps = param_shardings(cfg, mesh)
    assert (jax.tree_util.tree_structure(ps)
            == jax.tree_util.tree_structure(params))
    # every sharding must be valid for its param's shape
    for s, x in zip(jax.tree_util.tree_leaves(ps),
                    jax.tree_util.tree_leaves(params)):
        s.shard_shape(x.shape)   # raises if incompatible


def test_sharded_forward_matches_single_device(setup):
    cfg, params, mesh = setup
    sharded = shard_params(params, cfg, mesh)
    ids = np.random.default_rng(0).integers(0, 512, (4, 12)).astype(np.int32)
    ids_sh = jax.device_put(ids, data_sharding(mesh))
    want = model_lib.forward(params, cfg, jnp.asarray(ids))
    got = jax.jit(functools.partial(model_lib.forward, cfg=cfg, mesh=mesh))(
        sharded, ids=ids_sh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_sharded_prefill_decode(setup):
    cfg, params, mesh = setup
    sharded = shard_params(params, cfg, mesh)
    B, L = 2, 10
    ids = np.random.default_rng(1).integers(0, 512, (B, L)).astype(np.int32)
    ids_sh = jax.device_put(ids, data_sharding(mesh))
    cache = jax.jit(
        functools.partial(model_lib.init_cache, cfg, B, L + 4),
        out_shardings=cache_shardings(cfg, mesh))()
    logits, cache = jax.jit(
        functools.partial(model_lib.prefill, cfg=cfg, mesh=mesh))(
        sharded, ids=ids_sh, cache=cache)
    tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    step = jax.jit(functools.partial(model_lib.decode_step, cfg=cfg))
    logits_t, cache = step(sharded, token=tok, cache=cache)

    # oracle: unsharded full forward over prompt+token
    full = model_lib.forward(
        params, cfg, jnp.concatenate(
            [jnp.asarray(ids), np.asarray(tok)[:, None]], axis=1))
    np.testing.assert_allclose(np.asarray(logits_t),
                               np.asarray(full[:, -1]),
                               rtol=2e-4, atol=2e-4)


def test_dryrun_multichip():
    """Core dryrun: sharded train/prefill/decode + cp paths on the
    8-device virtual mesh. The five full-schema 7B GSPMD compiles are the
    `full` tier below (they dominated the suite's wall time and the
    driver's own dryrun_multichip run covers them every round)."""
    import sys
    sys.path.insert(0, '/root/repo')
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8, full_schema=False)


@pytest.mark.full
def test_dryrun_multichip_full_schema_compiles():
    import sys
    sys.path.insert(0, '/root/repo')
    import __graft_entry__
    __graft_entry__._dryrun_full_schema_compile(8)


def test_entry_compiles():
    import sys
    sys.path.insert(0, '/root/repo')
    import __graft_entry__
    fn, (params, ids) = __graft_entry__.entry()
    logits = jax.jit(fn)(params, ids)
    assert logits.shape[0] == ids.shape[0]
    assert np.all(np.isfinite(np.asarray(logits[:, :8])))


@pytest.fixture(scope='module')
def cp_setup():
    """(dp=2, cp=2, tp=2) mesh: heads (4) divisible by tp*cp, channels (64)
    too; small matmul-conv chunk so L = 8*chunk fits a CPU test
    (VERDICT round-1 next-step #2 done-criterion)."""
    cfg = tiny_config(hyena_matmul_chunk=8, state_prefill_chunk=8)
    params = model_lib.init_params(jax.random.PRNGKey(2), cfg)
    mesh = make_mesh(dp=2, cp=2, tp=2)
    return cfg, params, mesh


@pytest.mark.parametrize('cp_attn', ['ulysses', 'ring', 'zigzag'])
def test_cp_forward_matches_single_device(cp_setup, cp_attn):
    """Seq-sharded (dp, cp, tp) forward == dense single-device forward for
    every context-parallel attention algorithm."""
    cfg, params, mesh = cp_setup
    cfg = cfg.replace(cp_attn=cp_attn)
    sharded = shard_params(params, cfg, mesh)
    L = 64      # = 8 * hyena_matmul_chunk; divisible by 2*cp (zigzag)
    ids = np.random.default_rng(3).integers(0, 512, (4, L)).astype(np.int32)
    ids_sh = jax.device_put(ids, data_sharding(mesh))
    want = model_lib.forward(params, cfg, jnp.asarray(ids))
    got = jax.jit(functools.partial(model_lib.forward, cfg=cfg, mesh=mesh))(
        sharded, ids=ids_sh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_cp_prefill_decode_seam(cp_setup):
    """(dp, cp, tp) prefill fills a (tp, cp)-channel-sharded cache whose
    decode step matches the dense oracle."""
    cfg, params, mesh = cp_setup
    sharded = shard_params(params, cfg, mesh)
    B, L = 2, 64
    ids = np.random.default_rng(4).integers(0, 512, (B, L)).astype(np.int32)
    ids_sh = jax.device_put(ids, data_sharding(mesh))
    cache = jax.jit(
        functools.partial(model_lib.init_cache, cfg, B, L + 4),
        out_shardings=cache_shardings(cfg, mesh))()
    logits, cache = jax.jit(
        functools.partial(model_lib.prefill, cfg=cfg, mesh=mesh))(
        sharded, ids=ids_sh, cache=cache)
    # prefill logits themselves must match the dense forward
    want_prefill = model_lib.forward(params, cfg, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(want_prefill),
                               rtol=2e-4, atol=2e-4)
    tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    step = jax.jit(functools.partial(model_lib.decode_step, cfg=cfg))
    logits_t, cache = step(sharded, token=tok, cache=cache)
    full = model_lib.forward(
        params, cfg, jnp.concatenate(
            [jnp.asarray(ids), np.asarray(tok)[:, None]], axis=1))
    np.testing.assert_allclose(np.asarray(logits_t),
                               np.asarray(full[:, -1]),
                               rtol=2e-4, atol=2e-4)


def test_make_mesh_cp_axis():
    mesh = make_mesh(dp=2, cp=2, tp=2)
    assert mesh.shape == {'dp': 2, 'cp': 2, 'tp': 2}
    from evo_tpu.parallel.mesh import channel_axes, has_cp
    assert has_cp(mesh)
    assert channel_axes(mesh) == ('tp', 'cp')
    legacy = make_mesh(dp=2, tp=4)
    assert not has_cp(legacy)
    assert channel_axes(legacy) == 'tp'


def test_make_mesh_auto_dp():
    """dp=-1 derives dp from device_count / tp (pod launcher contract)."""
    mesh = make_mesh(dp=-1, tp=4)
    assert mesh.shape['dp'] == 2 and mesh.shape['tp'] == 4
    mesh = make_mesh(dp=-1, tp=8)
    assert mesh.shape['dp'] == 1 and mesh.shape['tp'] == 8
