"""Build the 10x derived dataset (~sf1) from sf0.1 at .scale10/.

Usage: python scripts/make_scale10.py [out_dir]
Then:  SPARK_GRAFT_SF_DIR=$PWD/.scale10 python bench.py

See scripts/make_scale.py for how the expansion works (key-shifted
copies, shared dimensions fixed, near-dup document texts).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.make_scale import build


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale10"
    )
    build(out_dir, copies=10)


if __name__ == "__main__":
    main()
