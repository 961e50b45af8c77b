"""Build dist/chs.zip for spark-submit --py-files (includes dtd.json)."""

from __future__ import annotations

import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def main():
    dist = ROOT / "dist"
    dist.mkdir(exist_ok=True)
    out = dist / "chs.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = ROOT / "closure_html_spark"
        for f in sorted(pkg.rglob("*")):
            if f.suffix in (".py", ".json") and "__pycache__" not in f.parts:
                z.write(f, f.relative_to(ROOT))
    print(out)


if __name__ == "__main__":
    main()
