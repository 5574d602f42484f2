"""Package the engine for ``spark-submit --py-files`` (the north-rule
deployment shape):

    python tools/package.py [dist/jassjr_spark.zip]
    spark-submit --master <cluster> --py-files dist/jassjr_spark.zip \
        jassjr_spark/index_job.py --input-parquet ... --output ...

The zip holds the ``jassjr_spark`` package at its root (Spark appends
py-files archives to every executor's and the driver's sys.path, so the
package must sit at the archive root, not under a repo-name prefix).
The build is DETERMINISTIC — sorted member order, fixed timestamps,
__pycache__ excluded — so the same tree always yields a byte-identical
artifact (reproducible deploys; a content-addressed artifact store can
dedupe it).
"""

from __future__ import annotations

import os
import sys
import zipfile

# any valid constant DOS timestamp; zip cannot represent "no timestamp"
_EPOCH = (1980, 1, 1, 0, 0, 0)


def build_zip(out_path: str, repo_root: str | None = None) -> str:
    repo_root = repo_root or os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    pkg = os.path.join(repo_root, "jassjr_spark")
    members: list[tuple[str, str]] = []
    for dirpath, dirnames, filenames in os.walk(pkg):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith((".pyc", ".pyo")):
                continue
            full = os.path.join(dirpath, fn)
            arc = os.path.relpath(full, repo_root)
            members.append((full, arc))
    os.makedirs(os.path.dirname(os.path.abspath(out_path)) or ".", exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, arc in members:
            info = zipfile.ZipInfo(arc, date_time=_EPOCH)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            with open(full, "rb") as f:
                zf.writestr(info, f.read())
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "dist/jassjr_spark.zip"
    print(build_zip(out))
