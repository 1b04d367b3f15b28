#!/usr/bin/env bash
# Fetch + convert the evaluation datasets (reference: load_datasets.sh):
# Stanford bunny / happy buddha / dragon / armadillo range scans and the
# ETH ASL apartment Hokuyo scans.  Conversion goes through
# tools/datasets.py (stanford: .conf quaternion poses -> ground_truth.csv;
# eth: CSV clouds -> PLY).  Run from the repo root.  Requires network
# access; each block is idempotent.
set -u
TOOLS_DIR="$(cd "$(dirname "$0")" && pwd)"
mkdir -p data
pushd data >/dev/null || exit 1
mkdir -p tmp

fetch() { # fetch <url> <archive>
  if [ ! -f "$2" ]; then
    wget -q --show-progress -O "$2" "$1" || { echo "download failed: $1"; return 1; }
  fi
}

# Stanford Bunny
if [ ! -d "bun" ]; then
  fetch http://graphics.stanford.edu/pub/3Dscanrep/bunny.tar.gz bunny.tar.gz &&
  tar -xf bunny.tar.gz -C tmp &&
  python "$TOOLS_DIR/datasets.py" stanford tmp/bunny/data -o bun
fi
# Happy Buddha
if [ ! -d "happyStandRight" ]; then
  fetch http://graphics.stanford.edu/pub/3Dscanrep/happy/happy_stand.tar.gz happy_stand.tar.gz &&
  tar -xf happy_stand.tar.gz -C tmp &&
  python "$TOOLS_DIR/datasets.py" stanford tmp/happy_stand -o happyStandRight
fi
# Dragon
if [ ! -d "dragonStandRight" ]; then
  fetch http://graphics.stanford.edu/pub/3Dscanrep/dragon/dragon_stand.tar.gz dragon_stand.tar.gz &&
  tar -xf dragon_stand.tar.gz -C tmp &&
  python "$TOOLS_DIR/datasets.py" stanford tmp/dragon_stand -o dragonStandRight
fi
# Armadillo
if [ ! -d "ArmadilloBack" ]; then
  fetch http://graphics.stanford.edu/pub/3Dscanrep/armadillo/Armadillo_scans.tar.gz Armadillo_scans.tar.gz &&
  tar -xf Armadillo_scans.tar.gz -C tmp &&
  python "$TOOLS_DIR/datasets.py" stanford tmp/Armadillo_scans -o ArmadilloBack
fi
# ETH ASL apartment (Hokuyo)
if [ ! -d "Hokuyo" ]; then
  fetch http://robotics.ethz.ch/~asl-datasets/apartment_03-Dec-2011-18_13_33/csv_local/local_frame.tar.gz Hokuyo.tar.gz &&
  mkdir -p tmp/Hokuyo && tar -xf Hokuyo.tar.gz -C tmp/Hokuyo &&
  python "$TOOLS_DIR/datasets.py" eth tmp/Hokuyo -o Hokuyo
fi

rm -rf tmp
popd >/dev/null || exit 1
