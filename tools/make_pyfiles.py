"""Build the spark-submit --py-files artifact.

    python tools/make_pyfiles.py [out.zip]

Produces a zip of the pycorrector_spark package (source only) for

    spark-submit --py-files pycorrector_spark.zip job.py

Dictionaries/LM artifacts are embedded in the package (dicts.py,
fixture-trained LM built on the driver), so the zip is the complete
executor-side dependency; production model files ship via --files.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "pycorrector_spark.zip")
    pkg = os.path.join(REPO, "pycorrector_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
