"""Build dist/medea_spark.zip for spark-submit --py-files."""

from __future__ import annotations

import os
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    dist = REPO / "dist"
    dist.mkdir(exist_ok=True)
    target = dist / "medea_spark.zip"
    with zipfile.ZipFile(target, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(REPO / "medea_spark"):
            for name in files:
                if name.endswith(".py"):
                    p = Path(root) / name
                    zf.write(p, p.relative_to(REPO))
    print(f"wrote {target}")


if __name__ == "__main__":
    main()
