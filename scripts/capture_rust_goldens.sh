#!/usr/bin/env bash
# Capture frame-for-frame goldens from the ACTUAL reference Rust crate.
#
# The parity oracle (tests/reference_impl.py) is a hand transcription; this
# script is the one-command path to pin it against the real thing the day a
# Rust toolchain is available (none exists in the build image — VERDICT r3 #2).
#
# Usage: scripts/capture_rust_goldens.sh [reference_dir]
#   1. copies the read-only reference crate to a scratch dir
#   2. injects scripts/rust_golden_harness.rs as examples/capture_goldens.rs
#   3. cargo run --release --example capture_goldens
#   4. writes tests/fixtures/rust_goldens.jsonl
# tests/test_rust_goldens.py then compares every line against the oracle
# (it is skipped while the jsonl is absent).
#
# The crate is from 2017 (sample 0.10, num 0.2); if current stable rustc
# rejects it, retry with a 2018-era toolchain, e.g.:
#   rustup toolchain install 1.30.0 && cargo +1.30.0 run ...
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
REF="${1:-/root/reference}"

if ! command -v cargo >/dev/null 2>&1; then
    echo "capture_rust_goldens: cargo not found — install a Rust toolchain first" >&2
    exit 2
fi
if [ ! -f "$REF/Cargo.toml" ]; then
    echo "capture_rust_goldens: no Cargo.toml under $REF" >&2
    exit 2
fi

SCRATCH="$(mktemp -d /tmp/voxbox_goldens.XXXXXX)"
trap 'rm -rf "$SCRATCH"' EXIT
cp -r "$REF"/. "$SCRATCH/"
chmod -R u+w "$SCRATCH"
mkdir -p "$SCRATCH/examples"
cp "$REPO/scripts/rust_golden_harness.rs" "$SCRATCH/examples/capture_goldens.rs"
# hound is a dev-dependency; examples see dev-deps, so no Cargo.toml edit needed.

OUT="$REPO/tests/fixtures/rust_goldens.jsonl"
(cd "$SCRATCH" && cargo run --release --example capture_goldens) > "$OUT.tmp"
mv "$OUT.tmp" "$OUT"
echo "wrote $(wc -l < "$OUT") golden records to $OUT"
echo "now run: python -m pytest tests/test_rust_goldens.py -q"
