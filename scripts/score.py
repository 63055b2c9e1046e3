"""CLI: FASTA in -> TSV of per-sequence log-likelihood scores out.

Flag parity with reference `scripts/score.py:25-29` (`--input-fasta
--output-tsv --model-name --batch-size --device`), plus TPU extensions:
`--checkpoint-path` (no-network environments), `--random-init`, mesh shape
flags, and shape bucketing to bound jit specializations.

Example:
    python -m scripts.score \
        --input-fasta examples/example_seqs.fasta \
        --output-tsv scores.tsv \
        --model-name evo-1-8k-base --checkpoint-path /path/to/snapshot
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

from evo_tpu.io.fasta import read_fasta
from evo_tpu.models import Evo
from evo_tpu.scoring import score_stream


def main():
    parser = argparse.ArgumentParser(
        description='Score sequences with Evo (TPU).')
    parser.add_argument('--input-fasta', required=True,
                        help='Path to input FASTA file')
    parser.add_argument('--output-tsv', required=True,
                        help='Path to output TSV file')
    parser.add_argument('--model-name', default='evo-1-8k-base')
    parser.add_argument('--batch-size', type=int, default=32)
    parser.add_argument('--device', default=None,
                        help='accepted for reference-CLI compat; unused '
                             '(JAX owns device placement)')
    parser.add_argument('--checkpoint-path', default=None,
                        help='local HF safetensors snapshot or converted '
                             'evo_tpu checkpoint')
    parser.add_argument('--random-init', action='store_true',
                        help='random weights (smoke tests / benchmarking)')
    parser.add_argument('--tiny', action='store_true',
                        help='tiny model of the same schema (CPU smoke '
                             'tests; implies --random-init)')
    parser.add_argument('--reduce-method', default='mean',
                        choices=['mean', 'sum'])
    parser.add_argument('--dp', type=int, default=1,
                        help='data-parallel mesh size')
    parser.add_argument('--cp', type=int, default=1,
                        help='context-parallel axis size (long-context '
                             'prefill; seq-sharded residual stream)')
    parser.add_argument('--tp', type=int, default=None,
                        help='tensor-parallel mesh size (default: all '
                             'devices / dp)')
    parser.add_argument('--no-bucket', action='store_true',
                        help='disable power-of-two length bucketing')
    parser.add_argument('--segment-len', type=int, default=None,
                        help='score in SEGMENT_LEN chunks through the '
                             'resumable cache (bounded activation memory '
                             'for 131k-class sequences); runs unbatched')
    parser.add_argument('--quant', default='none',
                        choices=['none', 'int8', 'int8x8', 'int4'],
                        help='opt-in serving precision (docs/serving.md): '
                             'int8 = weight-only; int8x8 = int8 weights + '
                             'dynamic int8 activations (2x MXU prefill '
                             'rate); int4 = memory-fit mode. Default '
                             'bf16 keeps the reference-parity numerics.')
    parser.add_argument('--kv-quant', default='none',
                        choices=['none', 'int8'],
                        help='int8 attention KV cache — halves the '
                             '6.4 GB 131k KV for --segment-len scoring '
                             '(docs/serving.md; opt-in)')
    args = parser.parse_args()

    # multi-host first, BEFORE any other jax call: on a TPU slice this is
    # what gives each worker its identity (scripts/score_pod.sh runs this
    # same command on every worker); single-machine runs return False fast
    from evo_tpu.parallel.distributed import initialize_distributed
    multihost = initialize_distributed()

    mesh = None
    if multihost:
        # per-host model replica: TP over this host's local chips; the
        # data-parallel axis is the HOSTS themselves (score_fasta_sharded
        # below), not a mesh axis — per-host batches never enter a
        # cross-host jit
        from evo_tpu.parallel.mesh import local_mesh
        import jax as _jax
        tp = args.tp if args.tp not in (None, 1) \
            else len(_jax.local_devices())
        if tp > 1 or args.cp != 1:
            mesh = local_mesh(dp=1, tp=tp, cp=args.cp)
    elif args.dp != 1 or args.cp != 1 or args.tp not in (None, 1):
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

    names, seqs = read_fasta(args.input_fasta)
    print(f'Scoring {len(seqs)} sequences...', flush=True)

    if multihost:
        # pod path: hosts split the FASTA (shard manifests + done-markers
        # make re-runs resume); host 0 writes the merged TSV in input
        # order, other workers exit quietly
        import csv

        from evo_tpu.parallel.distributed import score_fasta_sharded

        def score_batch(batch):
            if args.segment_len:
                from evo_tpu.scoring import score_sequences_segmented
                return score_sequences_segmented(
                    batch, evo.model, evo.tokenizer,
                    segment_len=args.segment_len,
                    reduce_method=args.reduce_method)
            from evo_tpu.scoring import score_sequences
            return score_sequences(batch, evo.model, evo.tokenizer,
                                   reduce_method=args.reduce_method)

        merged = score_fasta_sharded(
            args.input_fasta, args.output_tsv + '.work', score_batch,
            batch_size=args.batch_size)
        if merged is None:
            return None, None
        with open(merged) as f:
            rows = list(csv.reader(f))[1:]       # input order
        scores = [float(r[2]) for r in rows]
        with open(args.output_tsv, 'w') as f:
            f.write('seqs\tscores\n')
            for seq, score in zip(seqs, scores):
                f.write(f'{seq}\t{score}\n')
        print(f'Wrote {args.output_tsv}')
        return seqs, scores

    if args.segment_len:
        from evo_tpu.scoring import score_sequences_segmented
        scores = score_sequences_segmented(
            seqs, evo.model, evo.tokenizer,
            segment_len=args.segment_len,
            reduce_method=args.reduce_method)
    else:
        batches = [seqs[i:i + args.batch_size]
                   for i in range(0, len(seqs), args.batch_size)]
        scores = score_stream(
            batches, evo.model, evo.tokenizer,
            reduce_method=args.reduce_method,
            pad_to_bucket=not args.no_bucket,
            progress=lambda done: print(f'  {done}/{len(seqs)}',
                                        flush=True))

    with open(args.output_tsv, 'w') as f:
        f.write('seqs\tscores\n')
        for seq, score in zip(seqs, scores):
            f.write(f'{seq}\t{score}\n')
    print(f'Wrote {args.output_tsv}')


if __name__ == '__main__':
    main()
