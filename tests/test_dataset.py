"""Packed-FASTA training data pipeline (evo_tpu/io/dataset.py) and the
fine-tune CLI surface (scripts/finetune.py)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from evo_tpu.io.dataset import PackedFastaDataset
from evo_tpu.io.fasta import write_fasta
from evo_tpu.tokenizer import CharLevelTokenizer


@pytest.fixture()
def corpus(tmp_path):
    rng = np.random.default_rng(0)
    names, seqs = [], []
    for i in range(7):
        n = int(rng.integers(20, 90))
        names.append(f'seq{i}')
        seqs.append(''.join(rng.choice(list('ACGT'), n)))
    path = str(tmp_path / 'corpus.fasta')
    write_fasta(path, names, seqs, width=60)
    return path, seqs


def test_packing_covers_stream_exactly(corpus):
    path, seqs = corpus
    tok = CharLevelTokenizer(512)
    ds = PackedFastaDataset(path, tok, seq_len=32, batch_size=1, seed=3)
    assert ds.tokens_per_epoch == sum(len(s) + 1 for s in seqs)
    windows = ds.epoch_windows(epoch=0)
    mask = ds._epoch_mask
    flat = windows.reshape(-1)[mask.reshape(-1) > 0]
    # the unmasked stream is a permutation of records, each EOS-terminated
    assert flat.size == ds.tokens_per_epoch
    assert int(np.sum(flat == tok.eos_id)) == len(seqs)
    # reconstruct documents by splitting on EOS and compare as a multiset
    docs, cur = [], []
    for t in flat.tolist():
        if t == tok.eos_id:
            docs.append(bytes(cur).decode())
            cur = []
        else:
            cur.append(t)
    assert not cur
    assert sorted(docs) == sorted(seqs)
    # tail padding is masked and pad-valued
    tail = windows.reshape(-1)[mask.reshape(-1) == 0]
    assert np.all(tail == tok.pad_id)


def test_shuffle_is_deterministic_and_epoch_dependent(corpus):
    path, _ = corpus
    ds1 = PackedFastaDataset(path, seq_len=32, batch_size=1, seed=5)
    ds2 = PackedFastaDataset(path, seq_len=32, batch_size=1, seed=5)
    np.testing.assert_array_equal(ds1.epoch_windows(0), ds2.epoch_windows(0))
    assert not np.array_equal(ds1.epoch_windows(0), ds1.epoch_windows(1))


def test_process_sharding_partitions_windows(corpus):
    path, _ = corpus
    full = PackedFastaDataset(path, seq_len=16, batch_size=1, seed=1)
    shards = [PackedFastaDataset(path, seq_len=16, batch_size=1, seed=1,
                                 process_index=i, process_count=3)
              for i in range(3)]
    all_w = full.epoch_windows(0)
    got = [s.epoch_windows(0) for s in shards]
    assert sum(len(g) for g in got) == len(all_w)
    rebuilt = np.concatenate(
        [all_w[np.arange(len(all_w)) % 3 == i] for i in range(3)])
    np.testing.assert_array_equal(np.concatenate(got), rebuilt)


def test_iter_batches_shapes_and_epochs(corpus):
    path, _ = corpus
    ds = PackedFastaDataset(path, seq_len=16, batch_size=2, seed=0)
    batches = list(ds.iter_batches(epochs=2))
    assert len(batches) == 2 * ds.steps_per_epoch()
    for ids, mask in batches:
        assert ids.shape == (2, 17) and mask.shape == (2, 17)
        assert ids.dtype == np.int32 and mask.dtype == np.float32


@pytest.mark.full
def test_finetune_cli_end_to_end(corpus, tmp_path):
    """Tiny fine-tune run through the real CLI: loss decreases, both
    artifacts exist, and the serving checkpoint loads back into Evo."""
    path, _ = corpus
    save = str(tmp_path / 'ft')
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    out = subprocess.run(
        [sys.executable, '-m', 'scripts.finetune', '--input-fasta', path,
         '--tiny', '--seq-len', '32', '--batch-size', '2', '--steps', '8',
         '--lr', '1e-3', '--save-dir', save, '--log-every', '4'],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr[-3000:]
    assert os.path.exists(os.path.join(save, 'train_state'))
    assert os.path.exists(os.path.join(save, 'serving'))

    from evo_tpu.models import Evo
    evo = Evo('evo-1-8k-base',
              checkpoint_path=os.path.join(save, 'serving'))
    logits, _ = evo.model(np.asarray(evo.tokenizer.tokenize('ACGT'))[None])
    assert np.isfinite(np.asarray(logits, np.float32)).all()

    # resume continues from the saved step
    out2 = subprocess.run(
        [sys.executable, '-m', 'scripts.finetune', '--input-fasta', path,
         '--tiny', '--seq-len', '32', '--batch-size', '2', '--steps', '10',
         '--lr', '1e-3', '--save-dir', save, '--resume',
         '--log-every', '2'],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out2.returncode == 0, out2.stderr[-3000:]
    assert 'resumed at step 8' in out2.stdout


def test_training_loss_decreases_on_packed_batches(corpus):
    """Library-path smoke: a few optimizer steps on packed batches reduce
    the next-token loss on a tiny model."""
    import jax

    from evo_tpu import model as model_lib, training
    from evo_tpu.config import tiny_config

    path, _ = corpus
    cfg = tiny_config()
    params = model_lib.init_params(jax.random.PRNGKey(0), cfg)
    opt = training.make_optimizer(learning_rate=3e-3)
    state = training.init_train_state(params, opt)
    step = jax.jit(training.make_train_step(cfg, opt), donate_argnums=(0,))
    ds = PackedFastaDataset(path, seq_len=32, batch_size=2, seed=0)
    ids0, mask0 = next(ds.iter_batches())
    first = None
    for i, (ids, mask) in enumerate(ds.iter_batches(epochs=None)):
        state, loss = step(state, ids, mask)
        if first is None:
            first = float(loss)
        if i >= 19:
            break
    final = float(
        training.next_token_loss(
            jax.tree_util.tree_map(lambda p: p.astype(np.float32),
                                   state.params),
            cfg, ids0, mask0))
    assert final < first, (first, final)


def test_zero_batch_epoch_fails_loud(corpus):
    # corpus (~400 tokens) cut at seq_len 4096 -> 1 window < batch 8:
    # epochs=None must raise instead of re-shuffling forever
    ds = PackedFastaDataset(corpus[0], seq_len=4096, batch_size=8, seed=0)
    with pytest.raises(ValueError, match='corpus too small'):
        next(ds.iter_batches(epochs=None))
