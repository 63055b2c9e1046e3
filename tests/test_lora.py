"""LoRA adapter tests (evo_tpu/lora.py): identity at init, training moves
only the adapters, attach == merge numerically, save/load round trip, and
generation works on a merged tree."""

import jax
import jax.numpy as jnp
import numpy as np

from evo_tpu import lora as lora_lib
from evo_tpu import model as model_lib
from evo_tpu import training
from evo_tpu.config import tiny_config


def _cfg(**kw):
    base = dict(num_layers=3, hidden_size=32, num_attention_heads=2,
                attn_layer_idxs=(1,), hyena_layer_idxs=(0, 2),
                inner_mlp_size=48)
    base.update(kw)
    return tiny_config(**base)


def _setup(rank=4, targets=lora_lib.DEFAULT_TARGETS):
    cfg = _cfg()
    params = model_lib.init_params(jax.random.PRNGKey(0), cfg)
    lora = lora_lib.init_lora(jax.random.PRNGKey(1), params, cfg,
                              rank=rank, targets=targets)
    return cfg, params, lora


def test_identity_at_init():
    # B factors start at zero -> attached model == base model exactly
    cfg, params, lora = _setup()
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, 64, (2, 24)), jnp.int32)
    base_logits = model_lib.forward(params, cfg, ids)
    att_logits = model_lib.forward(
        lora_lib.attach_lora(params, lora, alpha=16.0), cfg, ids)
    np.testing.assert_allclose(np.asarray(att_logits),
                               np.asarray(base_logits), atol=1e-6)


def test_train_moves_only_adapters_and_loss_decreases():
    cfg, params, lora = _setup()
    opt = training.make_optimizer(learning_rate=1e-2)
    state = lora_lib.init_lora_train_state(lora, opt)
    step = jax.jit(lora_lib.make_lora_train_step(cfg, opt, alpha=16.0))

    ids = jnp.asarray(
        np.random.default_rng(1).integers(0, 64, (2, 24)), jnp.int32)
    mask = jnp.ones_like(ids, jnp.float32)
    losses = []
    for _ in range(10):
        state, loss = step(state, params, ids, mask)
        losses.append(float(loss))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    # adapters changed; base tree untouched by construction (functional) —
    # and at least one B factor is now nonzero
    bs = [np.abs(np.asarray(leaf)).max()
          for kp, leaf in jax.tree_util.tree_flatten_with_path(state.lora)[0]
          if jax.tree_util.keystr(kp).endswith("['b']")]
    assert max(bs) > 0.0


def test_attach_matches_merge():
    cfg, params, lora = _setup()
    # random nonzero adapters (trained-state stand-in)
    lora = jax.tree_util.tree_map(
        lambda x: jax.random.normal(jax.random.PRNGKey(7), x.shape,
                                    x.dtype) * 0.05, lora)
    ids = jnp.asarray(
        np.random.default_rng(2).integers(0, 64, (2, 16)), jnp.int32)
    att = model_lib.forward(lora_lib.attach_lora(params, lora, 8.0),
                            cfg, ids)
    mrg = model_lib.forward(lora_lib.merge_lora(params, lora, 8.0),
                            cfg, ids)
    np.testing.assert_allclose(np.asarray(att), np.asarray(mrg),
                               atol=2e-4, rtol=2e-4)


def test_merged_tree_generates():
    # merged tree must run the full prefill->decode seam unchanged
    from evo_tpu.generation import Generator
    from evo_tpu.models import EvoModel
    from evo_tpu.tokenizer import CharLevelTokenizer
    cfg, params, lora = _setup()
    lora = jax.tree_util.tree_map(
        lambda x: jax.random.normal(jax.random.PRNGKey(3), x.shape,
                                    x.dtype) * 0.05, lora)
    merged = lora_lib.merge_lora(params, lora, 16.0)
    gen = Generator(EvoModel(cfg, merged), CharLevelTokenizer(512),
                    top_k=1, temperature=0.0)
    toks, _, _ = gen.generate(input_ids=jnp.asarray([[65, 67, 71, 84]],
                                                    jnp.int32),
                              num_tokens=4)
    assert np.asarray(toks).shape == (1, 4)


def test_partial_targets():
    cfg, params, lora = _setup(targets=('w1', 'wqkv'))
    names = set()
    for kp, _ in jax.tree_util.tree_flatten_with_path(lora)[0]:
        names.add(jax.tree_util.keystr(kp))
    assert any('w1' in n for n in names)
    assert not any('w_out' in n for n in names)
    ids = jnp.asarray([[1, 2, 3, 4, 5, 6]], jnp.int32)
    base = model_lib.forward(params, cfg, ids)
    att = model_lib.forward(lora_lib.attach_lora(params, lora), cfg, ids)
    np.testing.assert_allclose(np.asarray(att), np.asarray(base),
                               atol=1e-6)


def test_save_load_roundtrip(tmp_path):
    cfg, params, lora = _setup()
    lora = jax.tree_util.tree_map(
        lambda x: jax.random.normal(jax.random.PRNGKey(9), x.shape,
                                    x.dtype) * 0.1, lora)
    path = str(tmp_path / 'adapters.npz')
    lora_lib.save_lora(lora, path, alpha=12.0)
    template = lora_lib.init_lora(jax.random.PRNGKey(0), params, cfg,
                                  rank=4)
    loaded, alpha = lora_lib.load_lora(path, template)
    assert alpha == 12.0
    for a, b in zip(jax.tree_util.tree_leaves(lora),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_rejects_rank_mismatch(tmp_path):
    import pytest
    cfg, params, lora = _setup(rank=4)
    path = str(tmp_path / 'adapters.npz')
    lora_lib.save_lora(lora, path)
    template = lora_lib.init_lora(jax.random.PRNGKey(0), params, cfg,
                                  rank=8)
    with pytest.raises(ValueError, match='rank/targets mismatch'):
        lora_lib.load_lora(path, template)


def test_merge_donate_matches_and_invalidates():
    # donate=True must produce the same merged tree while invalidating
    # the base buffers (the 16 GB-chip merge path, bench spec_lora)
    cfg, params, lora = _setup()
    lora = jax.tree_util.tree_map(
        lambda x: jax.random.normal(jax.random.PRNGKey(11), x.shape,
                                    x.dtype) * 0.05, lora)
    ref = lora_lib.merge_lora(params, lora, 16.0)
    merged = lora_lib.merge_lora(params, lora, 16.0, donate=True)
    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(merged)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)
    # at least the adapted leaves were donated away. Donation is
    # backend-dependent (some platforms warn-and-ignore it); only assert
    # invalidation where the backend actually deleted the buffer —
    # merge_lora is numerically correct either way (checked above).
    import pytest
    w1 = params['segments'][0]['stack']['mlp']['w1']
    if w1.is_deleted():
        with pytest.raises(Exception):
            np.asarray(w1)
