#!/bin/bash
#SBATCH --job-name=genome_design_pipeline
#SBATCH --output=/path/to/phage_filter_%j.log
#SBATCH --error=/path/to/phage_filter_%j.err
#SBATCH --time=48:00:00
#SBATCH --signal=B:USR1@300
#SBATCH --open-mode=append
#SBATCH --requeue
#SBATCH --partition=cpu_batch
#SBATCH --nodes=1
#SBATCH --cpus-per-task=96
#SBATCH --ntasks-per-node=1
#SBATCH --mem=320G

# Slurm launcher for the genome-design filtering pipeline (qc1-qc6).
# Stage checkpoints make the run restartable, so --requeue plus the
# pre-timeout USR1 signal give elastic recovery for free.
#
# Usage:
#   1. copy genome_design_filtering_pipeline_config_template.yaml next to
#      your results dir and edit paths/thresholds
#   2. point CONFIG_FILE below at it
#   3. sbatch phage_gen/pipelines/genome_design_filtering_pipeline.sh

set -u
START_TIME=$(date +%s)
echo "Running on hostname: $(hostname)"

CONFIG_FILE="${CONFIG_FILE:-/path/to/genome_design_filtering_pipeline_config_template.yaml}"

python -m phage_gen.pipelines.genome_design_filtering_pipeline \
    --config "$CONFIG_FILE"

ELAPSED=$(($(date +%s) - START_TIME))
printf 'Elapsed time: %02d:%02d:%02d\n' \
    $((ELAPSED/3600)) $(((ELAPSED%3600)/60)) $((ELAPSED%60))
