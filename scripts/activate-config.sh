#!/bin/sh
# Activate a configuration by copying it over scenes/_active.pbrt, the
# file every scene includes (the reference's scripts/N-*.sh pattern:
# `cp scenes/<cfg>.pbrt scenes/_active.pbrt`).
# Usage: scripts/activate-config.sh <scene-dir> <config-name>
set -e
SCENES_DIR="$1"
CFG="$2"
cp "$(dirname "$0")/../configs/${CFG}.pbrt" "${SCENES_DIR}/_active.pbrt"
echo "activated ${CFG} in ${SCENES_DIR}/_active.pbrt"
