"""Hello Evo: a guided tour of the evo_tpu engine.

The reference ships `scripts/hello_evo.ipynb`, a Colab notebook that
generates sequences through the hosted Together API and then runs
prodigal + ESMFold. This local equivalent drives the native engine
directly (no external service): scoring, positional entropies, and
generation, on either a real checkpoint or a random-weight tiny model.

Run (no checkpoint needed):
    JAX_PLATFORMS=cpu python examples/hello_evo.py --tiny
With a local checkpoint snapshot:
    python examples/hello_evo.py --model-name evo-1-8k-base \
        --checkpoint-path /path/to/snapshot
For the downstream gene-calling + folding steps, see
`scripts/generation_to_folding.py`.
"""

from __future__ import annotations

import argparse
import os
import sys

# allow `python examples/hello_evo.py` from a source checkout
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from evo_tpu import Evo, generate, positional_entropies, score_sequences
from evo_tpu.io.fasta import read_fasta

from evo_tpu.config import cli_tiny_overrides

TINY_OVERRIDES = cli_tiny_overrides()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--model-name', default='evo-1-8k-base')
    ap.add_argument('--checkpoint-path', default=None)
    ap.add_argument('--tiny', action='store_true',
                    help='random-weight tiny model (CPU-friendly demo)')
    args = ap.parse_args()

    print('== Loading model ==')
    evo = Evo(args.model_name,
              checkpoint_path=args.checkpoint_path,
              random_init=args.tiny,
              config_overrides=TINY_OVERRIDES if args.tiny else None)
    model, tokenizer = evo.model, evo.tokenizer
    print(f'{args.model_name}: {model.num_params / 1e6:.1f}M parameters')

    print('\n== Scoring the example FASTA ==')
    names, seqs = read_fasta(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 'example_seqs.fasta'))
    scores = score_sequences(seqs, model, tokenizer)
    for name, seq, score in zip(names, seqs, scores):
        print(f'  {name:24s} len={len(seq):3d} mean-logprob={score:+.4f}')

    print('\n== Positional entropies ==')
    ents = positional_entropies(seqs[:1], model, tokenizer)
    print(f'  {names[0]}: per-position entropy '
          f'{[round(float(e), 2) for e in ents[0][:8]]}...')

    print('\n== Generation ==')
    gen_seqs, gen_scores = generate(
        ['ACGT'] * 3, model, tokenizer, n_tokens=32, temperature=1.0,
        top_k=4, verbose=0)
    for seq, score in zip(gen_seqs, gen_scores):
        print(f'  {seq!r}  score={score:+.4f}')
    print('\n== Speculative decoding (self-similar prompts) ==')
    # On repetitive genomic sequence the n-gram drafter proposes the
    # continuation and one verify pass scores gamma tokens per weight
    # read — with real evo-1 weights this is how the >650k-token
    # self-similar generations get cheap (BASELINE.md: 1.7-2.0x plain
    # decode at acceptance 1.0 on a LoRA-learned tandem repeat).
    from evo_tpu.speculative import generate_speculative
    toks, logps, stats = generate_speculative(
        model, tokenizer, prompt='ACGTTGCAAC' * 12, num_tokens=24,
        gamma=8)
    print(f'  {tokenizer.detokenize(toks.tolist())!r}')
    print(f'  acceptance={stats.acceptance_rate:.2f} '
          f'tokens/device-call={stats.tokens_per_call:.2f} '
          f'(random weights: acceptance ~0 is expected)')

    print('\n== Long generation (resumable cache across regrowths) ==')
    # The reference demos >650k generated tokens; the machinery is the
    # resumable cache + aligned regrowth (generation.py). Chunked greedy
    # is token-exact vs one single call; at 7B the driver bench row
    # `long_generation_16k` and the BASELINE 65k run measure it on-chip.
    import numpy as np

    from evo_tpu.generation import Generator
    g = Generator(model, tokenizer, top_k=1, temperature=0.0)
    cache, nxt, pieces = None, tokenizer.tokenize('ACGTACGT')[None], []
    for _ in range(3):
        part, _, cache = g.generate(
            input_ids=nxt, num_tokens=16, inference_params_dict=cache,
            verbose=False)
        pieces.append(part[0])
        nxt = np.asarray(part)[0][-1:][None]
    total = np.concatenate([np.asarray(p) for p in pieces])
    print(f'  3 resumed chunks -> {len(total)} tokens: '
          f'{tokenizer.detokenize(total.tolist())[:48]!r}...')

    print('\nDone. Next steps: scripts/generation_to_folding.py folds '
          'generated proteins; semantic_design/ and phage_gen/ hold the '
          'full design pipelines.')


if __name__ == '__main__':
    main()
