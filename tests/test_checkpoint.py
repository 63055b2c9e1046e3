"""Checkpoint converter tests: a synthetic engine-layout (torch-naming)
state dict must round-trip into the evo_tpu pytree exactly — layouts,
transposes, stream/head reshapes, fp32 poles/residues, tied unembed, and
`backbone.` prefix stripping (reference `evo/models.py:122-137`)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.smoke

from evo_tpu import checkpoint, model as model_lib
from evo_tpu.config import tiny_config


def _params_to_engine_sd(params, cfg):
    """Inverse of convert_state_dict: evo_tpu pytree -> engine-naming numpy
    state dict (torch (out, in) Linear layout)."""
    D = cfg.hidden_size
    H, Dh = cfg.num_attention_heads, cfg.head_dim
    K = cfg.short_filter_length
    # NOTE: safetensors save_file silently corrupts non-contiguous arrays
    # (writes the base buffer's byte order), so every transposed tensor must
    # be made contiguous before saving.
    f32 = lambda x: np.ascontiguousarray(
        np.asarray(jnp.astype(x, jnp.float32)))
    sd = {'embedding_layer.weight': f32(params['embedding'])}
    if cfg.final_norm:
        sd['norm.scale'] = f32(params['final_norm'])
    from evo_tpu.model import layer_blocks
    for i, blk in enumerate(layer_blocks(params, cfg)):
        p = f'blocks.{i}.'
        sd[p + 'pre_norm.scale'] = f32(blk['pre_norm'])
        sd[p + 'post_norm.scale'] = f32(blk['post_norm'])
        sd[p + 'mlp.l1.weight'] = f32(blk['mlp']['w1']).T
        sd[p + 'mlp.l2.weight'] = f32(blk['mlp']['w2']).T
        sd[p + 'mlp.l3.weight'] = f32(blk['mlp']['w3']).T
        if 'attn' in blk:
            a = blk['attn']
            sd[p + 'inner_mha_cls.Wqkv.weight'] = \
                f32(a['wqkv']).reshape(D, 3 * H * Dh).T
            sd[p + 'inner_mha_cls.Wqkv.bias'] = f32(a['bqkv']).reshape(-1)
            sd[p + 'inner_mha_cls.out_proj.weight'] = \
                f32(a['wo']).reshape(H * Dh, D).T
            sd[p + 'inner_mha_cls.out_proj.bias'] = f32(a['bo'])
            # buffer that must be dropped by the converter
            sd[p + 'inner_mha_cls.rotary_emb.inv_freq'] = \
                np.ones(Dh // 2, np.float32)
        else:
            h = blk['hyena']
            sd[p + 'projections.weight'] = f32(h['w_in']).reshape(D, 3 * D).T
            sd[p + 'projections.bias'] = f32(h['b_in']).reshape(-1)
            sd[p + 'filter.short_filter_weight'] = \
                f32(h['fir_w']).reshape(3 * D, 1, K)
            sd[p + 'filter.short_filter_bias'] = f32(h['fir_b']).reshape(-1)
            sd[p + 'filter.poles'] = np.asarray(h['poles'])[:, :, None, :]
            sd[p + 'filter.residues'] = \
                np.asarray(h['residues'])[:, :, None, :]
            sd[p + 'filter.D'] = f32(h['d_skip'])
            sd[p + 'out_filter_dense.weight'] = f32(h['w_out']).T
            sd[p + 'out_filter_dense.bias'] = f32(h['b_out'])
    return {k: np.ascontiguousarray(v) for k, v in sd.items()}


@pytest.fixture(scope='module')
def tiny():
    cfg = tiny_config()
    params = model_lib.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_convert_round_trip(tiny):
    cfg, params = tiny
    sd = {'backbone.' + k: v for k, v in _params_to_engine_sd(
        params, cfg).items()}
    got = checkpoint.convert_state_dict(
        checkpoint.strip_backbone_prefix(sd), cfg)
    flat_want, tree_want = jax.tree_util.tree_flatten_with_path(params)
    flat_got = dict(jax.tree_util.tree_flatten_with_path(got)[0])
    assert tree_want == jax.tree_util.tree_structure(got)
    for path, want in flat_want:
        g = flat_got[path]
        assert g.shape == want.shape, path
        assert g.dtype == want.dtype, path
        np.testing.assert_allclose(
            np.asarray(jnp.astype(g, jnp.float32)),
            np.asarray(jnp.astype(want, jnp.float32)),
            rtol=1e-6, atol=1e-6, err_msg=str(path))


def test_poles_residues_stay_fp32(tiny):
    cfg, params = tiny
    cfg16 = cfg.replace(param_dtype='bfloat16')
    sd = _params_to_engine_sd(params, cfg)
    got = checkpoint.convert_state_dict(sd, cfg16)
    from evo_tpu.model import layer_blocks
    hy = layer_blocks(got, cfg16)[0]['hyena']
    assert hy['poles'].dtype == jnp.float32
    assert hy['residues'].dtype == jnp.float32
    assert hy['w_in'].dtype == jnp.bfloat16


def test_converted_params_run_forward(tiny):
    cfg, params = tiny
    sd = _params_to_engine_sd(params, cfg)
    got = checkpoint.convert_state_dict(sd, cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 11), 0, 512)
    lg_a = model_lib.forward(params, cfg, ids)
    lg_b = model_lib.forward(got, cfg, ids)
    np.testing.assert_allclose(np.asarray(lg_a), np.asarray(lg_b),
                               rtol=1e-5, atol=1e-5)


def test_unconsumed_keys_raise(tiny):
    cfg, params = tiny
    sd = _params_to_engine_sd(params, cfg)
    sd['blocks.0.some_novel_tensor'] = np.zeros(3, np.float32)
    with pytest.raises(ValueError, match='unconsumed'):
        checkpoint.convert_state_dict(sd, cfg)


def test_safetensors_round_trip(tiny, tmp_path):
    from safetensors.numpy import save_file

    cfg, params = tiny
    sd = {'backbone.' + k: v for k, v in _params_to_engine_sd(
        params, cfg).items()}
    save_file(sd, str(tmp_path / 'model.safetensors'))
    got = checkpoint.load_reference_checkpoint(str(tmp_path), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, 7), 0, 512)
    np.testing.assert_allclose(
        np.asarray(model_lib.forward(got, cfg, ids)),
        np.asarray(model_lib.forward(params, cfg, ids)),
        rtol=1e-5, atol=1e-5)


def test_export_matches_independent_inverse(tiny):
    """Production `export_state_dict` agrees with this file's independently
    written inverse on every tensor (layouts, transposes, reshapes)."""
    cfg, params = tiny
    want = _params_to_engine_sd(params, cfg)
    got = checkpoint.export_state_dict(params, cfg, include_buffers=False)
    extra = set(want) - set(got)
    assert all('inv_freq' in k for k in extra), extra
    assert set(got) <= set(want)
    for k, v in got.items():
        assert v.shape == want[k].shape, k
        np.testing.assert_allclose(np.asarray(v, np.float32),
                                   np.asarray(want[k], np.float32),
                                   rtol=0, atol=0, err_msg=k)


def test_export_convert_round_trip_bf16(tiny):
    """convert(export(p)) is bit-exact in bf16: the layout schema is
    self-consistent including dtype policy (fp32 poles/residues)."""
    cfg, params = tiny
    cfg16 = cfg.replace(param_dtype='bfloat16')
    params16 = jax.tree_util.tree_map(
        lambda x: x, checkpoint.convert_state_dict(
            _params_to_engine_sd(params, cfg), cfg16))
    sd = checkpoint.export_state_dict(params16, cfg16)
    got = checkpoint.convert_state_dict(sd, cfg16)
    for path_want, want in jax.tree_util.tree_flatten_with_path(params16)[0]:
        g = dict(jax.tree_util.tree_flatten_with_path(got)[0])[path_want]
        assert g.dtype == want.dtype, path_want
        np.testing.assert_array_equal(
            np.asarray(g).view(np.uint16) if g.dtype == jnp.bfloat16
            else np.asarray(g),
            np.asarray(want).view(np.uint16) if want.dtype == jnp.bfloat16
            else np.asarray(want), err_msg=str(path_want))


def test_write_snapshot_sharded_and_adaptive_load(tiny, tmp_path):
    """write_reference_snapshot(num_shards=3) produces an index.json layout
    the sharded reader + adaptive loader consume; forward outputs match."""
    cfg, params = tiny
    cfg16 = cfg.replace(param_dtype='bfloat16')
    params16 = checkpoint.convert_state_dict(
        _params_to_engine_sd(params, cfg), cfg16)
    path = str(tmp_path / 'snap')
    checkpoint.write_reference_snapshot(params16, cfg16, path, num_shards=3)
    import os
    assert os.path.exists(os.path.join(path,
                                       'model.safetensors.index.json'))
    got, cfg_out = checkpoint.load_reference_checkpoint_adaptive(
        path, cfg16, verbose=False)
    assert cfg_out == cfg16
    ids = jax.random.randint(jax.random.PRNGKey(3), (1, 9), 0, 512)
    np.testing.assert_array_equal(
        np.asarray(model_lib.forward(got, cfg16, ids)),
        np.asarray(model_lib.forward(params16, cfg16, ids)))


def test_validate_state_dict_reports(tiny):
    cfg, params = tiny
    sd = checkpoint.export_state_dict(params, cfg)
    report = checkpoint.validate_state_dict(sd, cfg)
    assert report['ok'], checkpoint.format_validation_report(report)
    assert report['ignored_buffers']          # inv_freq present
    bad = dict(sd)
    removed = 'blocks.0.filter.poles'
    bad.pop(removed)
    bad['blocks.0.filter.novel'] = np.zeros(2, np.float32)
    bad['norm.scale'] = np.zeros((3, 3), np.float32)
    report = checkpoint.validate_state_dict(bad, cfg)
    assert not report['ok']
    assert removed in report['missing']
    assert 'blocks.0.filter.novel' in report['unexpected']
    assert 'norm.scale' in report['shape_mismatch']
    text = checkpoint.format_validation_report(report)
    assert 'FAILED' in text and removed in text


def test_infer_config_overrides_from_shapes(tiny):
    """The snapshot is ground truth: a different inner MLP width / state
    size / layer partition is adopted from the real shapes (SURVEY §2.A)."""
    cfg, _ = tiny
    cfg_real = cfg.replace(inner_mlp_size=96, state_size=6,
                           attn_layer_idxs=(2,), hyena_layer_idxs=())
    params = model_lib.init_params(jax.random.PRNGKey(7), cfg_real)
    sd = checkpoint.export_state_dict(params, cfg_real)
    ovr = checkpoint.infer_config_overrides(sd, cfg)
    assert ovr['inner_mlp_size'] == 96
    assert ovr['state_size'] == 6
    assert ovr['attn_layer_idxs'] == (2,)
    # adaptive load end-to-end: wrong prior config, right result
    got, cfg_out = None, None
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        checkpoint.write_reference_snapshot(params, cfg_real, d)
        got, cfg_out = checkpoint.load_reference_checkpoint_adaptive(
            d, cfg, verbose=False)
    assert cfg_out.inner_mlp_size == 96
    assert cfg_out.state_size == 6
    ids = jax.random.randint(jax.random.PRNGKey(4), (1, 6), 0, 512)
    np.testing.assert_allclose(
        np.asarray(model_lib.forward(got, cfg_out, ids)),
        np.asarray(model_lib.forward(params, cfg_real, ids)),
        rtol=1e-6, atol=1e-6)


def test_infer_config_rejects_wrong_hidden_size(tiny):
    cfg, params = tiny
    sd = checkpoint.export_state_dict(params, cfg)
    with pytest.raises(ValueError, match='hidden_size'):
        checkpoint.infer_config_overrides(
            sd, cfg.replace(hidden_size=cfg.hidden_size * 2,
                            num_filters=cfg.hidden_size * 2))


def test_verify_parity_harness_self_consistent(tiny):
    """compute_outputs vs itself passes; a perturbed copy fails (the
    comparison actually discriminates)."""
    from evo_tpu.models import EvoModel
    from evo_tpu.tokenizer import CharLevelTokenizer
    from scripts.verify_parity import compare, compute_outputs

    cfg, params = tiny
    model = EvoModel(cfg, params)
    tok = CharLevelTokenizer(512)
    seqs = ['ACGT', 'CAGATTCCATT']
    ours = compute_outputs(model, tok, seqs, greedy_tokens=4)
    assert {'logits_0', 'logits_1', 'scores_mean', 'scores_sum',
            'greedy_ids'} <= set(ours)
    assert compare(dict(ours), dict(ours), tol=1e-3)
    bad = dict(ours)
    bad['scores_mean'] = ours['scores_mean'] + 1.0
    assert not compare(bad, dict(ours), tol=1e-3)


def test_native_save_load_round_trip(tiny, tmp_path):
    cfg, params = tiny
    path = str(tmp_path / 'native')
    checkpoint.save_native(params, path, cfg)
    assert checkpoint.is_native_checkpoint(path)
    got = checkpoint.load_native(path, cfg)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    cfg2 = checkpoint.native_config(path)
    assert cfg2 == cfg


def test_adaptive_load_depth_change_same_attn(tiny, tmp_path):
    """Review regression: a snapshot with MORE layers whose attention
    indices happen to match the prior config must adapt (previously
    cfg.replace kept the stale hyena partition and tripped the
    partition assertion)."""
    cfg8 = tiny_config(num_layers=8, attn_layer_idxs=(1,),
                       hyena_layer_idxs=())
    params8 = model_lib.init_params(jax.random.PRNGKey(1), cfg8)
    path = str(tmp_path / 'deep')
    checkpoint.write_reference_snapshot(params8, cfg8, path)
    cfg4 = tiny_config()          # 4 layers, attn also at (1,)
    assert tuple(cfg4.attn_layer_idxs) == (1,)
    got, cfg_out = checkpoint.load_reference_checkpoint_adaptive(
        path, cfg4, verbose=False)
    assert cfg_out.num_layers == 8
    assert tuple(cfg_out.hyena_layer_idxs) == (0, 2, 3, 4, 5, 6, 7)


def test_native_checkpoint_reloads_its_saved_config(tiny, tmp_path):
    """Review regression: a native checkpoint saved under an ADAPTED
    config must reload under it, not under the registry default."""
    cfg8 = tiny_config(num_layers=8, attn_layer_idxs=(1, 5),
                       hyena_layer_idxs=(), inner_mlp_size=112)
    params8 = model_lib.init_params(jax.random.PRNGKey(2), cfg8)
    path = str(tmp_path / 'native')
    checkpoint.save_native(params8, path, cfg=cfg8)
    cfg4 = tiny_config()
    rec = checkpoint.reconcile_native_config(path, cfg4)
    assert rec.num_layers == 8
    assert tuple(rec.attn_layer_idxs) == (1, 5)
    assert rec.inner_mlp_size_actual == cfg8.inner_mlp_size_actual
    # runtime fields stay caller-owned
    assert rec.param_dtype == cfg4.param_dtype
    from evo_tpu.models import load_checkpoint
    model, cfg_out = load_checkpoint('evo-1-8k-base', checkpoint_path=path,
                                     config_overrides=dict(
                                         **{k: getattr(cfg4, k) for k in
                                            ('hidden_size', 'num_filters',
                                             'num_attention_heads',
                                             'state_size', 'compute_dtype',
                                             'param_dtype')},
                                         use_pallas='never'))
    assert cfg_out.num_layers == 8
    ids = jax.random.randint(jax.random.PRNGKey(3), (1, 7), 0, 512)
    np.testing.assert_allclose(
        np.asarray(model(ids)[0]),
        np.asarray(model_lib.forward(params8, cfg8, ids)), atol=1e-5)


def test_untied_config_tied_snapshot_copies_embedding(tiny):
    """Reference behavior (evo/models.py:136-137): unembed absent in the
    snapshot + tie_embeddings=False -> the embedding is copied in."""
    cfg, params = tiny
    sd = _params_to_engine_sd(params, cfg)
    assert 'unembed.weight' not in sd
    cfg_untied = cfg.replace(tie_embeddings=False)
    got = checkpoint.convert_state_dict(dict(sd), cfg_untied)
    np.testing.assert_array_equal(np.asarray(got['unembed']),
                                  np.asarray(got['embedding']))


def test_tied_config_untied_snapshot_fails_loud(tiny):
    """A snapshot whose unembed differs from the embedding under
    tie_embeddings=True must raise, not silently drop the tensor."""
    cfg, params = tiny
    sd = _params_to_engine_sd(params, cfg)
    sd['unembed.weight'] = sd['embedding_layer.weight'] + 1.0
    with pytest.raises(ValueError, match='tie_embeddings'):
        checkpoint.convert_state_dict(dict(sd), cfg)
    # identical copy is tolerated (some exporters materialize the tie)
    sd['unembed.weight'] = sd['embedding_layer.weight'].copy()
    checkpoint.convert_state_dict(dict(sd), cfg)


def test_validate_accepts_squeezed_short_filter(tiny):
    """'ok is True iff conversion succeeds': the converter accepts a
    squeezed (3D, K) short filter, so validation must too."""
    cfg, params = tiny
    sd = checkpoint.export_state_dict(params, cfg)
    for k in list(sd):
        if k.endswith('.short_filter_weight'):
            assert sd[k].ndim == 3
            sd[k] = sd[k][:, 0, :]
    report = checkpoint.validate_state_dict(sd, cfg)
    assert report['ok'], checkpoint.format_validation_report(report)
    checkpoint.convert_state_dict(dict(sd), cfg)


def test_adversarial_mislayout_caught_by_fingerprint(tiny):
    """VERDICT r4 #7: each RECONSTRUCTED_LAYOUTS assumption, converted
    under its deliberately-WRONG variant, passes the shape validator by
    construction — the numeric fingerprint must be what flags it (and the
    model outputs must actually differ, proving the flag matters)."""
    cfg, params = tiny
    sd = checkpoint.export_state_dict(params, cfg)
    good = checkpoint.convert_state_dict(dict(sd), cfg)
    fp_good = checkpoint.fingerprint_params(good)
    # round-trip sanity: original tree and converted tree fingerprints match
    assert checkpoint.compare_fingerprints(
        checkpoint.fingerprint_params(params), fp_good) == []

    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, 512, (1, 16)), jnp.int32)
    ref_logits = model_lib.forward(good, cfg, ids)
    for key in checkpoint.RECONSTRUCTED_LAYOUTS:
        bad = checkpoint.convert_state_dict(dict(sd), cfg,
                                            debug_mislayout=key)
        report = checkpoint.validate_state_dict(sd, cfg)
        assert report['ok'], key          # shapes CANNOT catch it
        problems = checkpoint.compare_fingerprints(
            checkpoint.fingerprint_params(bad), fp_good)
        assert problems, key              # ...the fingerprint does
        assert any('LAYOUT' in p for p in problems), (key, problems)
        bad_logits = model_lib.forward(bad, cfg, ids)
        diff = float(jnp.max(jnp.abs(bad_logits - ref_logits)))
        assert diff > 1e-3, (key, diff)   # and the numerics really break


def test_unknown_mislayout_rejected(tiny):
    cfg, params = tiny
    sd = checkpoint.export_state_dict(params, cfg)
    with pytest.raises(ValueError, match='debug_mislayout'):
        checkpoint.convert_state_dict(dict(sd), cfg,
                                      debug_mislayout='typo')
