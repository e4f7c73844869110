"""One-command MNIST fetch for the BNN_MNIST target.

Downloads the standard keras ``mnist.npz`` archive (60k train / 10k test,
28x28 uint8 — the same data tensorflow-datasets serves the reference at
bnn.py:320-336), verifies its published SHA-256, and drops it where
``gmmvi_tpu.experiments.targets.datasets.load_mnist`` looks first:
``$GMMVI_DATASETS/mnist.npz`` if set, else the package's bundled
``datasets/`` directory.

Usage:
    python scripts/fetch_mnist.py [--dest DIR]

After this, the ``MNIST*`` experiment configs run for real — no
GMMVI_ALLOW_SYNTHETIC needed.  (This image has no network egress, so the
script exists for user sites; the loader also accepts an existing keras
cache at ~/.keras/datasets/mnist.npz.)
"""
from __future__ import annotations

import argparse
import hashlib
import os
import sys
import urllib.request
from pathlib import Path

URL = "https://storage.googleapis.com/tensorflow/tf-keras-datasets/mnist.npz"
# published hash, identical to keras.src.datasets.mnist.load_data's pin
SHA256 = "731c5ac602752760c8e48fbffcf8c3b850d9dc2a2aedcf2cc48468fc17b673d1"


def default_dest() -> Path:
    env = os.environ.get("GMMVI_DATASETS")
    if env:
        return Path(env)
    import gmmvi_tpu.experiments.targets.datasets as ds

    return ds._PKG_DATA


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dest", type=Path, default=None,
                    help="directory to place mnist.npz in "
                         "(default: $GMMVI_DATASETS or the package data dir)")
    args = ap.parse_args()
    dest_dir = args.dest or default_dest()
    dest_dir.mkdir(parents=True, exist_ok=True)
    dest = dest_dir / "mnist.npz"
    if dest.exists():
        data = dest.read_bytes()
        if hashlib.sha256(data).hexdigest() == SHA256:
            print(f"already present and verified: {dest}")
            return 0
        print(f"existing {dest} fails the checksum; re-downloading")

    print(f"downloading {URL} ...")
    with urllib.request.urlopen(URL, timeout=120) as r:
        data = r.read()
    digest = hashlib.sha256(data).hexdigest()
    if digest != SHA256:
        print(f"SHA-256 mismatch: got {digest}, expected {SHA256}",
              file=sys.stderr)
        return 1
    dest.write_bytes(data)
    print(f"saved {len(data):,} bytes to {dest} (sha256 verified)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
