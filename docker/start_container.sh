#!/usr/bin/env bash
# Counterpart of the reference's docker/start_container.sh: jupyter on 8888,
# repo mounted for live editing.
set -euo pipefail
cd "$(dirname "$0")/.."
docker run --rm -it -p 8888:8888 -v "$PWD":/opt/mbt_gym_tpu mbt_gym_tpu "$@"
