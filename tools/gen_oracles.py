"""Regenerate the materialized pure-Python oracle tables.

Usage: python tools/gen_oracles.py [sf_dir] [--force] [query ...]

Defaults to /root/testdata/sf0.01 (the driver's comparison SF). With no
query names, regenerates every table in materialize.TABLES.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ner_backend_spark.oracle import materialize  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--force"]
    force = "--force" in sys.argv[1:]
    # an SF dir is recognized in ANY position; everything else must be a
    # known query name (a typo'd name or misplaced dir used to be silently
    # dropped, regenerating the wrong thing while printing success)
    dirs = [a for a in args if os.path.isdir(a)]
    if len(dirs) > 1:
        print(f"multiple SF dirs given: {dirs}")
        return 2
    sf_dir = dirs[0] if dirs else "/root/testdata/sf0.01"
    only = [a for a in args if not os.path.isdir(a)] or None
    if only:
        unknown = [q for q in only if q not in materialize.TABLES]
        if unknown:
            print(
                f"unknown quer{'y' if len(unknown) == 1 else 'ies'}: "
                f"{unknown}; known: {sorted(materialize.TABLES)}"
            )
            return 2

    out_dir = materialize.default_oracle_dir(sf_dir)
    if force and only is None and os.path.isdir(out_dir):
        shutil.rmtree(out_dir)

    t0 = time.monotonic()
    if only:
        os.makedirs(out_dir, exist_ok=True)
        materialize.generate(sf_dir, out_dir, only=only)
        # partial regeneration invalidates the stamp: drop it so
        # ensure_oracles rebuilds the full set next time
        stamp = os.path.join(out_dir, "_VERSION")
        if os.path.exists(stamp):
            os.remove(stamp)
    else:
        materialize.ensure_oracles(sf_dir, out_dir)
    print(f"oracles -> {out_dir} [{time.monotonic() - t0:.1f}s]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
