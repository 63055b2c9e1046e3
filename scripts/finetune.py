"""Fine-tuning CLI: FASTA corpus -> updated Evo checkpoint.

The reference ships no training code, but two of its five registered
checkpoints are fine-tunes of evo-1-8k-base (crispr / transposon,
`/root/reference/evo/models.py:13-19`); this is the entry point that
workflow needs. Wires the packed-FASTA data pipeline
(`evo_tpu/io/dataset.py`) into the mixed-precision AdamW train step
(`evo_tpu/training.py`, fp32 masters) and writes two artifacts:

  * `<save-dir>/train_state/` — orbax params+optimizer+step for resume;
  * `<save-dir>/serving/`     — a native serving checkpoint (bf16
    weights, fp32 poles/residues) loadable with
    `Evo(..., checkpoint_path=<save-dir>/serving)`.

Single-chip by default; `--dp/--tp` builds a GSPMD mesh (weights sharded
on tp, the global batch on dp — per-host batch stays `--batch-size`).

Example (tiny CPU smoke; example_seqs.fasta is ~50 tokens, so seq-len
must be small enough to cut >= batch-size windows per epoch — the
dataset fails loud otherwise):
    python -m scripts.finetune --input-fasta examples/example_seqs.fasta \
        --tiny --seq-len 16 --batch-size 2 --steps 10 --save-dir /tmp/ft
"""

from __future__ import annotations

import argparse
import os

# honor JAX_PLATFORMS before any backend initializes: on machines with an
# out-of-tree TPU plugin the env var alone loses to the plugin, but the
# programmatic config wins (same trick as tests/conftest.py)
if os.environ.get('JAX_PLATFORMS'):
    import jax
    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])

import time

import jax


def main():
    p = argparse.ArgumentParser(description='Fine-tune Evo on FASTA (TPU).')
    p.add_argument('--input-fasta', action='append', required=True,
                   help='training FASTA (repeatable; .gz supported)')
    p.add_argument('--model-name', default='evo-1-8k-base')
    p.add_argument('--checkpoint-path', default=None)
    p.add_argument('--random-init', action='store_true')
    p.add_argument('--tiny', action='store_true',
                   help='tiny same-schema model (CPU smoke; implies '
                        '--random-init)')
    p.add_argument('--seq-len', type=int, default=8192)
    p.add_argument('--batch-size', type=int, default=1,
                   help='per-host batch (global = batch x hosts under dp)')
    p.add_argument('--steps', type=int, default=100)
    p.add_argument('--lr', type=float, default=1e-4)
    p.add_argument('--lr-schedule', choices=('constant', 'cosine'),
                   default='cosine',
                   help='cosine: linear warmup to --lr then cosine decay '
                        'to --end-lr-frac * lr at --steps (the standard '
                        'continued-pretraining recipe; docs/training.md)')
    p.add_argument('--warmup-steps', type=int, default=None,
                   help='default: steps/10, capped at 100')
    p.add_argument('--end-lr-frac', type=float, default=0.1)
    p.add_argument('--weight-decay', type=float, default=0.01)
    p.add_argument('--grad-clip', type=float, default=1.0)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--dp', type=int, default=1)
    p.add_argument('--tp', type=int, default=None)
    p.add_argument('--lora-rank', type=int, default=0,
                   help='>0 enables LoRA fine-tuning (evo_tpu/lora.py): '
                        'base weights frozen in their serving dtypes, '
                        'only rank-r adapters train — the single-chip '
                        '7B fine-tune mode (~12.9 GB resident vs ~84 GB '
                        'for full fp32-master AdamW)')
    p.add_argument('--lora-alpha', type=float, default=16.0)
    p.add_argument('--lora-targets', default=None,
                   help='comma list of adapted weights (default: all of '
                        'w1,w2,w3,wqkv,wo,w_in,w_out)')
    p.add_argument('--no-remat', action='store_true',
                   help='disable per-block rematerialization (more memory, '
                        'slightly faster backward)')
    p.add_argument('--save-dir', required=True)
    p.add_argument('--save-every', type=int, default=0,
                   help='checkpoint every N steps (0 = only at the end)')
    p.add_argument('--resume', action='store_true',
                   help='resume optimizer/step from save-dir/train_state')
    p.add_argument('--log-every', type=int, default=10)
    args = p.parse_args()

    from evo_tpu import training
    from evo_tpu.io.dataset import PackedFastaDataset
    from evo_tpu.models import Evo

    mesh = None
    if args.dp != 1 or args.tp not in (None, 1):
        from evo_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(dp=args.dp, tp=args.tp)

    overrides = {'remat': not args.no_remat}
    if args.tiny:
        args.random_init = True
        from evo_tpu.config import cli_tiny_overrides
        overrides.update(cli_tiny_overrides())
    evo = Evo(args.model_name, checkpoint_path=args.checkpoint_path,
              random_init=args.random_init, config_overrides=overrides,
              mesh=mesh)
    cfg = evo.config
    serving_dtypes = jax.tree_util.tree_map(lambda x: x.dtype,
                                            evo.model.params)

    if args.lr_schedule == 'cosine':
        lr = training.warmup_cosine(args.lr, total_steps=args.steps,
                                    warmup_steps=args.warmup_steps,
                                    end_lr_frac=args.end_lr_frac)
    else:
        lr = args.lr
    optimizer = training.make_optimizer(
        learning_rate=lr, weight_decay=args.weight_decay,
        grad_clip=args.grad_clip)
    if args.lora_rank > 0:
        from evo_tpu import lora as lora_lib
        targets = (tuple(t.strip() for t in args.lora_targets.split(','))
                   if args.lora_targets else lora_lib.DEFAULT_TARGETS)
        adapters = lora_lib.init_lora(
            jax.random.PRNGKey(args.seed), evo.model.params, cfg,
            rank=args.lora_rank, targets=targets)
        state = lora_lib.init_lora_train_state(adapters, optimizer)
        if args.resume and os.path.exists(
                os.path.join(args.save_dir, 'train_state')):
            tmpl = training.TrainState(state.lora, state.opt_state,
                                       state.step)
            got = training.load_train_state(args.save_dir, tmpl)
            state = lora_lib.LoraTrainState(got.params, got.opt_state,
                                            got.step)
            print(f'resumed at step {int(state.step)}', flush=True)
        step_fn = jax.jit(lora_lib.make_lora_train_step(
            cfg, optimizer, alpha=args.lora_alpha, mesh=mesh),
            donate_argnums=(0,))
    else:
        state = training.init_train_state(evo.model.params, optimizer)
        if args.resume and os.path.exists(
                os.path.join(args.save_dir, 'train_state')):
            state = training.load_train_state(args.save_dir, state)
            print(f'resumed at step {int(state.step)}', flush=True)

        if mesh is not None:
            step_fn = training.make_sharded_train_step(cfg, optimizer, mesh)
        else:
            step_fn = jax.jit(training.make_train_step(cfg, optimizer),
                              donate_argnums=(0,))

    ds = PackedFastaDataset(
        args.input_fasta, evo.tokenizer, seq_len=args.seq_len,
        batch_size=args.batch_size, seed=args.seed,
        process_index=jax.process_index(),
        process_count=jax.process_count())
    print(f'{len(ds._records)} records, ~{ds.tokens_per_epoch} tokens/'
          f'epoch, {ds.steps_per_epoch()} steps/epoch/host', flush=True)

    def save(state):
        os.makedirs(args.save_dir, exist_ok=True)
        from evo_tpu import checkpoint as ckpt
        if args.lora_rank > 0:
            # resume state (adapters + moments) via the shared orbax
            # saver, the portable adapters alone as npz, and a merged
            # serving checkpoint (`lora.merge_lora`)
            training.save_train_state(
                training.TrainState(state.lora, state.opt_state,
                                    state.step), args.save_dir)
            lora_lib.save_lora(
                state.lora, os.path.join(args.save_dir, 'adapters.npz'),
                alpha=args.lora_alpha)
            ckpt.save_native(
                lora_lib.merge_lora(evo.model.params, state.lora,
                                    args.lora_alpha),
                os.path.join(args.save_dir, 'serving'), cfg=cfg)
        else:
            training.save_train_state(state, args.save_dir)
            ckpt.save_native(
                training.serving_params(state, serving_dtypes),
                os.path.join(args.save_dir, 'serving'), cfg=cfg)

    if args.lora_rank > 0:
        base_params = evo.model.params
        run_step = lambda st, ids, mask: step_fn(st, base_params, ids,
                                                 mask)  # noqa: E731
    else:
        run_step = step_fn

    start = int(state.step)
    t0 = time.time()
    done = start
    for ids, mask in ds.iter_batches():
        if done >= args.steps:
            break
        state, loss = run_step(state, ids, mask)
        done += 1
        if args.log_every and done % args.log_every == 0:
            loss = float(loss)          # sync point
            rate = (done - start) * args.batch_size * (args.seq_len + 1) \
                / max(time.time() - t0, 1e-9)
            print(f'step {done}  loss {loss:.4f}  '
                  f'{rate:,.0f} tok/s/host', flush=True)
        if args.save_every and done % args.save_every == 0:
            save(state)
    save(state)
    print(f'done: {done} steps; serving checkpoint at '
          f'{os.path.join(args.save_dir, "serving")}', flush=True)


if __name__ == '__main__':
    main()
