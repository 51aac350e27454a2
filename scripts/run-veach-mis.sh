#!/bin/sh
# Benchmark config 1 (BASELINE.md): veach-mis with full statistics.
# The veach-mis scene is self-contained; other scenes need their assets
# downloaded next to their scene-stat.pbrt first.
set -e
ROOT="$(dirname "$0")/.."
SCENES="${1:-$ROOT/scenes}"
mkdir -p "$SCENES/veach-mis"
test -f "$SCENES/veach-mis/scene-stat.pbrt" || {
  echo "place the veach-mis scene-stat.pbrt under $SCENES/veach-mis/"; exit 1; }
sh "$ROOT/scripts/activate-config.sh" "$SCENES" render-for-ours
python -m statmc_tpu --writeimages --baseseed 0 --outdir out \
  "$SCENES/veach-mis/scene-stat.pbrt"
