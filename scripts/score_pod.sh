#!/bin/bash
# Pod-scale FASTA scoring launcher — the TPU equivalent of the reference's
# Slurm L5 layer (reference: phage_gen/pipelines/*.sh sbatch scripts; here
# the scale-out axis is a multi-host TPU slice instead of a CPU cluster).
#
# Runs the same command on every TPU worker of a slice; jax.distributed
# picks up worker identity from the TPU runtime environment
# (evo_tpu/parallel/distributed.py:initialize_distributed), DP shards the
# FASTA per host, and host 0 writes the merged TSV
# (evo_tpu/parallel/distributed.py:score_fasta_sharded — shard manifests +
# done-markers make re-runs resume).
#
# Usage (from a machine with gcloud access to the slice):
#   TPU_NAME=my-v5p-slice ZONE=us-east5-a \
#     scripts/score_pod.sh genomes.fasta out.tsv evo-1-131k-base /ckpt/path
#
# On a Slurm-managed TPU cluster, submit the inner command per node with
# srun instead of gcloud; JAX_COORDINATOR_ADDRESS must point at node 0.

set -euo pipefail

INPUT_FASTA=${1:?input fasta}
OUTPUT_TSV=${2:?output tsv}
MODEL_NAME=${3:-evo-1-8k-base}
CKPT=${4:?checkpoint path (sharded-load per host)}
TP=${TP:-4}    # chips per host on ICI; DP spans hosts over DCN

CMD="python -m scripts.score \
  --input-fasta ${INPUT_FASTA} --output-tsv ${OUTPUT_TSV} \
  --model-name ${MODEL_NAME} --checkpoint-path ${CKPT} \
  --dp -1 --tp ${TP}"   # dp=-1: derive hosts from the slice at runtime

gcloud compute tpus tpu-vm ssh "${TPU_NAME}" \
  --zone "${ZONE}" --worker=all --command "cd $(pwd) && ${CMD}"
