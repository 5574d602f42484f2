"""Executable-oracle harness: run the reference JASSjr Python pair.

SURVEY.md §5 strategy (b): `/root/reference/JASSjr_index.py` +
`JASSjr_search.py` are runnable; we render our documents rows to TREC XML
(sources/trec.py), index+search with the reference in a temp dir, and
compare rank-by-rank docnos AND 4-decimal scores. This file RUNS the
reference as a black box; no reference code is copied.
"""

from __future__ import annotations

import hashlib
import subprocess
import sys
from pathlib import Path

from jassjr_spark.sources.trec import render_trec

REFERENCE_DIR = Path("/root/reference")


def sha256(text: str) -> str:
    return hashlib.sha256(text.encode()).hexdigest()


def run_reference(
    docs: list[tuple[str, str]], query_lines: list[str], workdir: Path
) -> list[str]:
    """[(docno, content)] + query lines -> reference TREC run lines.

    Also asserts the per-row sha256(content) invariant between the input
    rows and the rendered TREC corpus (BASELINE.json input_hint): rendering
    must not alter content bytes.
    """
    workdir.mkdir(parents=True, exist_ok=True)
    corpus = render_trec(docs)
    # per-row invariant: content bytes survive the TREC rendering round-trip
    rendered_rows = [
        line.split(" </DOCNO> ", 1)[1].rsplit(" </DOC>", 1)[0]
        for line in corpus.strip("\n").split("\n")
    ]
    for (_, content), rendered in zip(docs, rendered_rows):
        assert sha256(content) == sha256(rendered), "TREC rendering altered content"

    xml = workdir / "corpus.xml"
    xml.write_text(corpus)
    subprocess.run(
        [sys.executable, str(REFERENCE_DIR / "JASSjr_index.py"), str(xml)],
        cwd=workdir, check=True, capture_output=True,
    )
    proc = subprocess.run(
        [sys.executable, str(REFERENCE_DIR / "JASSjr_search.py")],
        cwd=workdir, check=True, capture_output=True,
        input="\n".join(query_lines) + "\n", text=True,
    )
    return [ln for ln in proc.stdout.splitlines() if ln]
