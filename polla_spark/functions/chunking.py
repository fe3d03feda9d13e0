"""Document chunking: native plan + Python UDTF extensibility surface.

The production path is the native expression pipeline in
plans/llmdata.q89_token_chunks (sequence → slice → explode, all inside
whole-stage codegen, zero Python). This module adds the same kernel as
a Spark 4 **Python UDTF** — the engine's user-extensibility surface
for table-valued functions (the reference has no UDF/UDTF surface at
all; SURVEY.md §2.6 notes extensibility is its loader registry).

The UDTF is deliberately the SLOW path: row-at-a-time Python, one
generator call per document. It exists so users can prototype custom
1→N expansions (chunkers, sentence splitters, parsers) without
touching the plan layer; tests/test_chunking.py pins UDTF ≡ native so
the two kernels cannot drift. Port a UDTF to native expressions (or a
mapInPandas batch kernel) before running it over 100 TB.
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Iterator

try:  # Spark >= 3.5 (this repo targets Spark 4)
    from pyspark.sql.functions import udtf
except ImportError:  # pragma: no cover - older runtimes
    udtf = None  # type: ignore[assignment]

#: Window/stride shared with plans/llmdata.q89_token_chunks.
CHUNK, STRIDE = 50, 40

_WS = re.compile(r"\s+")


def iter_chunks(text: str) -> Iterator[tuple[int, int, int, str]]:
    """Yield (chunk_idx, token_start, n_tokens, chunk_md5) windows.

    Mirrors the native plan exactly: tokens = regex-split on
    whitespace (same semantics as ``F.split(text, '\\s+')``), windows
    of CHUNK tokens every STRIDE tokens, md5 over the
    space-rejoined window.
    """
    toks = _WS.split(text)
    n = len(toks)
    for start in range(0, max(n - 1, 0) + 1, STRIDE):
        window = toks[start : start + CHUNK]
        digest = hashlib.md5(" ".join(window).encode("utf-8")).hexdigest()
        yield (start // STRIDE, start, len(window), digest)


if udtf is not None:

    @udtf(returnType="chunk_idx bigint, token_start bigint, n_tokens bigint, chunk_md5 string")
    class ChunkDocUDTF:
        """LATERAL-joinable table function: one row per token window.

        Usage::

            spark.udtf.register("chunk_doc", ChunkDocUDTF)
            spark.sql("SELECT d.doc_id, c.* FROM docs d, "
                      "LATERAL chunk_doc(d.text) c")
        """

        def eval(self, text: str | None) -> Iterator[tuple[int, int, int, str]]:
            if text is None:
                return
            yield from iter_chunks(text)
else:  # pragma: no cover - older runtimes
    ChunkDocUDTF = None  # type: ignore[assignment]
