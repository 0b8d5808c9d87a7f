#!/usr/bin/env bash
# Counterpart of the reference's docker/build_image.sh.
set -euo pipefail
cd "$(dirname "$0")/.."
docker build -f docker/Dockerfile -t mbt_gym_tpu .
