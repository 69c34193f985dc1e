"""Build the 100x derived dataset (~sf10, ~60M lineitem rows) at .scale100/.

Usage: python scripts/make_scale100.py [out_dir]
Then:  SPARK_GRAFT_SF_DIR=$PWD/.scale100 python bench.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.make_scale import build


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale100"
    )
    build(out_dir, copies=100)


if __name__ == "__main__":
    main()
