"""Engine constants — the observable contract of the reference engine.

Citations are into /root/reference (read-only):
* K1=0.9, B=0.4       — JASSjr_search.py:13-14, JASSjr_search.cpp:27-28
* ATIRE BM25 formula  — JASSjr_search.py:81, JASSjr_search.cpp:210-220
* token regex         — JASSjr_index.py:23 (word alternative only; the
                        `<[^>]*>` tag alternative is a TREC-file parsing
                        concern handled in sources/trec.py)
* 255-byte truncation — JASSjr_index.py:56, JASSjr_index.cpp:151-154
* top-k = 1000        — JASSjr_search.py:98, JASSjr_search.cpp:236
* run name "JASSjr"   — JASSjr_search.py:100
"""

K1: float = 0.9
B: float = 0.4
TOP_K: int = 1000
RUN_NAME: str = "JASSjr"

# Default driver-side postings budget (entries) for InteractiveSearcher's
# LRU cache / resident warm-all — also the workload floor the gated batch
# path consults BEFORE constructing a searcher (driver_queries).
LOCAL_POSTINGS_BUDGET: int = 5_000_000

# A term is a maximal ASCII alnum run optionally continued by alnum/hyphen.
TOKEN_RE: str = "[a-zA-Z0-9][a-zA-Z0-9-]*"
# Tokens are clipped to 255 chars so the reference can store the length in
# one byte; we enforce it to stay rank-identical (it changes term identity).
MAX_TOKEN_LEN: int = 255
