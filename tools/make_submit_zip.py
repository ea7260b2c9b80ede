"""Build dist/review_crawler_spark.zip for `spark-submit --py-files`.

The zip holds the package (not tests/tools) with the package directory at
the zip root, which is what --py-files expects: executors unzip it onto
sys.path and `import review_crawler_spark` resolves.

    python tools/make_submit_zip.py
    spark-submit --py-files dist/review_crawler_spark.zip jobs/run_crawl.py ...
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "review_crawler_spark")
OUT = os.path.join(REPO, "dist", "review_crawler_spark.zip")


def main() -> None:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in sorted(os.walk(PKG)):
            if "__pycache__" in root:
                continue
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.relpath(full, REPO)
                zf.write(full, rel)
    n = len(zipfile.ZipFile(OUT).namelist())
    print(f"{OUT}: {n} files, {os.path.getsize(OUT)} bytes")


if __name__ == "__main__":
    main()
