"""Train the CRF emission artifact (ner_backend_spark/core/crf_weights.npz).

Usage: python tools/train_crf.py [--check]

Deterministic end to end (fixed seeds, zero init, no optimizer RNG): any
machine reproduces the committed artifact. ``--check`` retrains and
verifies the artifact on disk matches, without writing.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

from ner_backend_spark.core.crf_train import (  # noqa: E402
    WEIGHTS_FILE,
    load_artifact,
    save_artifact,
    train_emissions,
)


def main() -> int:
    t0 = time.monotonic()
    arrays = train_emissions()
    dt = time.monotonic() - t0
    if "--check" in sys.argv[1:]:
        disk = load_artifact()
        for k, v in arrays.items():
            if not np.array_equal(disk[k], v):
                print(f"MISMATCH in {k}: artifact is stale, re-run without --check")
                return 1
        print(f"artifact matches retrained weights [{dt:.1f}s]")
        return 0
    save_artifact(arrays)
    kb = os.path.getsize(WEIGHTS_FILE) / 1024
    print(f"wrote {WEIGHTS_FILE} ({kb:.0f} KiB) [{dt:.1f}s]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
