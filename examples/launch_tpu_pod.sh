#!/usr/bin/env bash
# Multi-host TPU pod launch (the reference's Slurm launcher equivalent,
# examples/launch_intermediate.sh — here the topology comes from the TPU
# runtime, not SLURM env plumbing).
#
# Single host (e.g. v5e-8):
#   python examples/train.py configs/interm_117m.yaml
#
# Pod slice (every host runs the same command; jax.distributed.initialize()
# autodetects coordinator + process index from the TPU metadata):
#   gcloud compute tpus tpu-vm ssh "$TPU_NAME" --worker=all --command="
#     cd ~/orbit2-tpu &&
#     ORBIT2_USE_SAMPLESTORE=1 python examples/train.py \
#       configs/interm_1b.yaml --distributed"
#
# Mesh sizing: parallelism.{fsdp,simple_ddp,tensor_par,seq_par} in the YAML
# must multiply to the total chip count of the slice, e.g. a v5p-128
# (64 chips) for interm_1b's fsdp8 x ddp2 x tp4.

set -euo pipefail
CONFIG="${1:-configs/interm_117m.yaml}"
exec python examples/train.py "$CONFIG" --distributed
