"""CLI sampling (flag parity with reference `scripts/generate.py:24-35`).

Example:
    python -m scripts.generate --prompt ACGT --n-samples 10 --n-tokens 100 \
        --temperature 1.0 --top-k 4 --model-name evo-1-8k-base \
        --checkpoint-path /path/to/snapshot
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

from evo_tpu.generation import generate
from evo_tpu.models import Evo


def main():
    parser = argparse.ArgumentParser(description='Generate with Evo (TPU).')
    parser.add_argument('--prompt', required=True)
    parser.add_argument('--n-samples', type=int, default=3)
    parser.add_argument('--n-tokens', type=int, default=100)
    parser.add_argument('--temperature', type=float, default=1.0)
    parser.add_argument('--top-k', type=int, default=4)
    parser.add_argument('--top-p', type=float, default=1.0)
    parser.add_argument('--model-name', default='evo-1-8k-base')
    parser.add_argument('--cached-generation', action='store_true',
                        default=True,
                        help='accepted for compat; decode is always cached')
    parser.add_argument('--batched', action='store_true', default=True)
    parser.add_argument('--prepend-bos', action='store_true', default=False)
    parser.add_argument('--device', default=None,
                        help='compat flag; unused under JAX')
    parser.add_argument('--verbose', type=int, default=1)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--checkpoint-path', default=None)
    parser.add_argument('--random-init', action='store_true')
    parser.add_argument('--tiny', action='store_true',
                        help='tiny same-schema model (CPU smoke tests; '
                             'implies --random-init)')
    parser.add_argument('--dp', type=int, default=1)
    parser.add_argument('--tp', type=int, default=None)
    parser.add_argument('--cp', type=int, default=1)
    parser.add_argument('--prefill-segment-len', type=int, default=None,
                        help='prefill long prompts in chunks of this many '
                             'tokens through the resumable cache (bounded '
                             'activation memory for 131k-class prompts)')
    parser.add_argument('--ngram', type=int, default=12,
                        help='speculative drafter: longest gram length '
                             'tried (longest-match down to 4; DNA needs '
                             'long grams — only 4^k distinct k-mers)')
    parser.add_argument('--speculative', type=int, default=0, metavar='G',
                        help='n-gram speculative decoding with G proposed '
                             'tokens per verify pass '
                             '(evo_tpu/speculative.py). Greedy is '
                             'token-exact; with --temperature > 0 it is '
                             'exact speculative SAMPLING (point-draft '
                             'rejection, same distribution as plain '
                             'sampling). Big wins on repetitive '
                             'sequence; 0 = off.')
    parser.add_argument('--quant', default='none',
                        choices=['none', 'int8', 'int8x8', 'int4'],
                        help='opt-in serving precision (docs/serving.md): '
                             'int8 = weight-only (~1.8x B=1 decode); '
                             'int8x8 = + dynamic int8 activations; int4 = '
                             'memory-fit mode. Default bf16 keeps the '
                             'reference-parity numerics.')
    parser.add_argument('--kv-quant', default='none',
                        choices=['none', 'int8'],
                        help='int8 attention KV cache: halves the '
                             'long-context cache footprint and per-step '
                             'cache reads (docs/serving.md; opt-in)')
    args = parser.parse_args()

    mesh = None
    if args.dp != 1 or args.cp != 1 or args.tp not in (None, 1):
        from evo_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(dp=args.dp, tp=args.tp, cp=args.cp)

    overrides = None
    if args.tiny:
        args.random_init = True
        from evo_tpu.config import cli_tiny_overrides
        overrides = cli_tiny_overrides()
    if args.quant != 'none':
        from evo_tpu.config import cli_quant_overrides
        overrides = dict(overrides or {}, **cli_quant_overrides(args.quant))
    if args.kv_quant != 'none':
        overrides = dict(overrides or {}, kv_quant=args.kv_quant)
    evo = Evo(args.model_name, checkpoint_path=args.checkpoint_path,
              random_init=args.random_init, config_overrides=overrides,
              mesh=mesh)

    if args.speculative:
        import numpy as np

        from evo_tpu.speculative import generate_speculative
        seqs, scores = [], []
        for i in range(args.n_samples):
            toks, logps, stats = generate_speculative(
                evo.model, evo.tokenizer, prompt=args.prompt,
                num_tokens=args.n_tokens, gamma=args.speculative,
                ngram=args.ngram,
                temperature=args.temperature, top_k=args.top_k,
                top_p=args.top_p, seed=args.seed + i)
            seqs.append(evo.tokenizer.detokenize(toks.tolist()))
            scores.append(float(np.mean(logps)))
            if args.verbose:
                print(f'Output: "{seqs[-1]}", Score: {scores[-1]:.4f} '
                      f'(acceptance {stats.acceptance_rate:.2f}, '
                      f'{stats.tokens_per_call:.2f} tokens/device-call)')
        return seqs, scores

    prompts = [args.prompt] * args.n_samples
    seqs, scores = generate(
        prompts, evo.model, evo.tokenizer,
        n_tokens=args.n_tokens, temperature=args.temperature,
        top_k=args.top_k, top_p=args.top_p, batched=args.batched,
        prepend_bos=args.prepend_bos, cached_generation=True,
        prefill_segment_len=args.prefill_segment_len,
        verbose=args.verbose, seed=args.seed)
    return seqs, scores


if __name__ == '__main__':
    main()
