"""Build the --py-files artifact for cluster submission.

The north rule runs the job "via spark-submit --py-files on N and 4N
executors"; this packages the engine into one zip that both the driver
and every executor import from:

    python tools/make_pyfiles.py                 # -> dist/fae_spark.zip
    spark-submit --py-files dist/fae_spark.zip app.py apply ...

The zip is deterministic (sorted entries, fixed timestamps) so re-builds
of the same tree are byte-identical — a cluster can cache it by hash.
Mirrors the reference's single-binary deploy story (its Makefile builds
one `french-admin-etl` executable); for PySpark the unit of deployment
is the package zip.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PACKAGE = "french_admin_etl_spark"


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "fae_spark.zip")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    entries = []
    pkg_root = os.path.join(REPO, PACKAGE)
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for f in sorted(filenames):
            if f.endswith(".py"):
                full = os.path.join(dirpath, f)
                entries.append((full, os.path.relpath(full, REPO)))
    tmp = out_path + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
        for full, arc in entries:
            info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            with open(full, "rb") as fh:
                z.writestr(info, fh.read())
    os.replace(tmp, out_path)  # atomic: a concurrent submit never sees a torn zip
    return out_path


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(path)
