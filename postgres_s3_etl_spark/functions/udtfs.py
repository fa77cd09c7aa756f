"""Python UDTFs (Spark 4 ``@udtf`` table functions).

The lateral-join-native escape hatch for 1→N row expansion logic
that genuinely needs Python (a tokenizer library, a parser). The
engine-side array expression is ALWAYS preferred when expressible —
``text_chunk`` in operators/text_analysis.py is the production
chunker; ``ChunkDocUDTF`` is its Python twin, kept to (a) prove the
API surface and (b) serve as the template for chunkers that need a
real tokenizer. Tests assert the two produce identical chunks.

Arrow note: ``useArrow=True`` batches rows through Arrow instead of
pickled rows — the same 10-100× batching win as Pandas UDFs.
"""

from __future__ import annotations

import hashlib


def make_chunk_udtf(chunk_tokens: int, stride: int):
    """Build a chunking UDTF class (parameterized at creation, since
    UDTFs take only column arguments at call time)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_id int, n_tokens int, chunk_md5 string", useArrow=True)
    class ChunkDocUDTF:
        def eval(self, text: str):
            toks = text.strip().split()
            n = len(toks)
            last = max(0, -(-(n - chunk_tokens) // stride))  # ceil
            for i in range(last + 1):
                chunk = toks[i * stride : i * stride + chunk_tokens]
                digest = hashlib.md5(" ".join(chunk).encode()).hexdigest()
                yield i, len(chunk), digest

    return ChunkDocUDTF
