#!/usr/bin/env bash
# Multi-host training launcher (the jax.distributed replacement for the
# reference's SLURM+torchrun DDP scripts, Unet_v5/training/slurm/*.sbatch).
#
# On each host of a TPU pod slice (or under SLURM with one task per host):
#   JAX_COORDINATOR_ADDRESS=<host0>:8476 \
#   bash scripts/launch_multihost.sh --preset unet_v5 train.epochs=30 ...
#
# jax.distributed.initialize() picks up process id/count from the TPU
# runtime metadata (or SLURM_* variables); climsim_tpu.run calls it
# automatically when JAX_COORDINATOR_ADDRESS is set
# (climsim_tpu/parallel/mesh.py:distributed_init_if_needed).
set -euo pipefail
exec python -m climsim_tpu.run "$@"
