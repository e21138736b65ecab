"""Package rtsa_spark as a zip for ``spark-submit --py-files``.

Usage: python tools/make_pyfiles_zip.py [out.zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(out: str = "rtsa_spark.zip") -> None:
    out_path = os.path.join(REPO, out)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "rtsa_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    print(out_path)


if __name__ == "__main__":
    main(*sys.argv[1:])
