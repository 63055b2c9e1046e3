"""Minimal forward-pass demo (parity with reference
`scripts/example_inference.py:21-52`): a single sequence, then a ragged
batch via `prepare_batch`; prints logits of shape (batch, length, vocab).

    python -m scripts.example_inference [--checkpoint-path ... | --random-init]
"""

from __future__ import annotations

import os

# honor JAX_PLATFORMS before any backend initializes: on machines with an
# out-of-tree TPU plugin the env var alone loses to the plugin, but the
# programmatic config wins (same trick as tests/conftest.py)
if os.environ.get('JAX_PLATFORMS'):
    import jax
    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])

import argparse

import numpy as np

from evo_tpu.models import Evo
from evo_tpu.scoring import prepare_batch


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--model-name', default='evo-1-8k-base')
    parser.add_argument('--checkpoint-path', default=None)
    parser.add_argument('--random-init', action='store_true')
    parser.add_argument('--device', default=None, help='compat flag; unused')
    args = parser.parse_args()

    evo = Evo(args.model_name, checkpoint_path=args.checkpoint_path,
              random_init=args.random_init)
    model, tokenizer = evo.model, evo.tokenizer

    sequence = 'ACGT'
    input_ids = np.asarray(tokenizer.tokenize(sequence), dtype=np.int32)[None]
    logits, _ = model(input_ids)
    print('Logits: ', np.asarray(logits))
    print('Shape (batch, length, vocab): ', logits.shape)

    seqs = ['ACGT', 'CAGATTCCATT', 'GAATTCC']
    input_ids, seq_lengths = prepare_batch(seqs, tokenizer, prepend_bos=False)
    print('Batch shape: ', input_ids.shape, ' lengths: ', seq_lengths)
    logits, _ = model(input_ids)
    print('Batch logits shape (batch, length, vocab): ', logits.shape)


if __name__ == '__main__':
    main()
