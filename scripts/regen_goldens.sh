#!/usr/bin/env bash
# Regenerate the final_state goldens that were stripped from the reference
# mount (/root/reference/.MISSING_LARGE_BLOBS lists check/256x256 and
# check/1024x1024 final_state files): build the reference C solver with its
# own flags (reference Makefile:6) and run the two decks, validate each run
# against the SHIPPED av_vels golden (the sensitive accumulated-error probe,
# check/check.py), then xz the pressure-field outputs into goldens/.
#
# Usage: scripts/regen_goldens.sh   [REF=/root/reference] [OUT=goldens]
# Runtime: ~8 min (256^2, 80k iters) + ~30 min (1024^2, 20k iters) serial C.
set -euo pipefail
REF=${REF:-/root/reference}
OUT=${OUT:-$(cd "$(dirname "$0")/../goldens" && pwd)}
SCRATCH=$(mktemp -d)
trap 'rm -rf "$SCRATCH"' EXIT

cp "$REF"/d2q9-bgk.c "$REF"/input_*.params "$REF"/obstacles_*.dat "$SCRATCH"/
cd "$SCRATCH"
gcc -std=c99 -Wall -Ofast -mtune=native -march=native \
    -funsafe-math-optimizations d2q9-bgk.c -lm -o d2q9-bgk

for deck in 256x256 1024x1024; do
  mkdir -p "$deck"
  (
    cd "$deck"
    ../d2q9-bgk ../input_"$deck".params ../obstacles_"$deck".dat
    # sanity: this host's run must reproduce the SHIPPED av_vels golden
    # (BC4 build) inside the 1% contract before we trust its final_state
    python "$REF"/check/check.py \
        --ref-av-vels-file="$REF"/check/"$deck".av_vels.dat \
        --ref-final-state-file=final_state.dat \
        --av-vels-file=av_vels.dat --final-state-file=final_state.dat
    xz -9 -T4 -c final_state.dat > "$OUT/$deck.final_state.dat.xz"
    sha=$(sha256sum final_state.dat | cut -d' ' -f1)
    grep -v " $deck.final_state.dat\$" "$OUT/SHA256SUMS" 2>/dev/null \
        > "$OUT/SHA256SUMS.tmp" || true
    echo "$sha  $deck.final_state.dat" >> "$OUT/SHA256SUMS.tmp"
    sort -k2 "$OUT/SHA256SUMS.tmp" > "$OUT/SHA256SUMS"
    rm -f "$OUT/SHA256SUMS.tmp"
  )
done
echo "goldens regenerated into $OUT"
