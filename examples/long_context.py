"""Full 131k-context genomics analysis on a single 16 GB TPU chip.

The evo-1-131k-base config reaches 131,072 tokens via interpolated
rotary embeddings (`/root/reference/evo/configs/
evo-1-131k-base_inference.yml:39-40`); the reference serves it on an
80 GB A100. This example runs the same context length on one 16 GB
v5e using the opt-in serving modes (docs/serving.md):

  * int8 weights + int8 activations (6.6 GB resident, 2x MXU rate)
  * segmented prefill through the donating resumable cache
    (O(segment) activations; exact modal/FIR state carry)
  * the Pallas segment-vs-buffer flash kernel for the 3 attention
    layers (1024-aligned KV buffers, ~6.4 GB)

Swap `random_init=True` for `checkpoint_path=...` to run real weights.

Usage:  python examples/long_context.py [length] [segment]
"""

import sys
import time

import numpy as np

from evo_tpu.models import Evo
from evo_tpu.scoring import (positional_entropies_segmented,
                             score_sequences_segmented)

L = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
SEG = int(sys.argv[2]) if len(sys.argv) > 2 else 8192

evo = Evo('evo-1-131k-base', random_init=True,
          config_overrides=dict(weight_quant='int8', act_quant='int8'))

# L-1 bases + BOS = exactly L tokens -> every segment shares one
# compiled shape (a ragged tail would add a slow extra compile)
seq = ''.join(np.random.default_rng(0).choice(list('ACGT'), L - 1))

t0 = time.perf_counter()
score = score_sequences_segmented([seq], evo.model, evo.tokenizer,
                                  segment_len=SEG)[0]
dt = time.perf_counter() - t0
print(f'{L}-token context scored in {dt:.1f}s '
      f'({L / dt:.0f} tok/s): mean logprob {score:.4f}')

t0 = time.perf_counter()
ents = positional_entropies_segmented([seq], evo.model, evo.tokenizer,
                                      segment_len=SEG)[0]
dt = time.perf_counter() - t0
print(f'per-position entropies in {dt:.1f}s: '
      f'first/median/last = {ents[0]:.3f}/{np.median(ents):.3f}/'
      f'{ents[-1]:.3f} nats over {len(ents)} positions')

# generation continuing a long prompt: chunked prompt prefill, then the
# fused decode scan (evo_tpu/generation.py prefill_segment_len)
from evo_tpu.generation import generate  # noqa: E402

t0 = time.perf_counter()
seqs, scores = generate([seq[:4 * SEG]], evo.model, evo.tokenizer,
                        n_tokens=64, top_k=4, temperature=1.0,
                        prefill_segment_len=SEG, verbose=0)
dt = time.perf_counter() - t0
print(f'generated 64 tokens from a {4 * SEG}-token prompt in {dt:.1f}s; '
      f'score {scores[0]:.4f}')
