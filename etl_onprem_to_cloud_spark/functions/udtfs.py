"""Python UDTF surface (Spark table functions).

Completes the UDF-surface story alongside ``@udf`` and ``pandas_udf``
(functions/udfs.py): a UDTF is the row-GENERATING escape hatch -- one
input row yields many output rows -- for generators that built-in
``explode``/``sequence`` expressions cannot express (stateful parsers,
tokenizer libraries, retrieval chunkers with overlap rules, ...).

TokenChunks itself IS expressible with pure exprs (sequence + slice),
which is deliberate: it gives the UDTF path a value-exact SQL oracle,
so the driver verifies the whole lateral-join machinery (per-row fanout,
column alignment, empty inputs) rather than trusting it.  The UDTF is
Arrow-batched where pyspark supports it (ArrowEvalPythonUDTF -- rows
cross the Python boundary in Arrow batches, the same escape-hatch tier
as pandas_udf); hot paths should still prefer the expression form.
"""

from __future__ import annotations

CHUNK_SIZE = 10

try:  # pyspark >= 3.5
    from pyspark.sql.functions import udtf

    class _TokenChunks:
        """One row per CHUNK_SIZE-token chunk of the input text.

        Token rule matches queries/_util.duck_tokens(lower=False):
        split on runs of spaces, drop empties."""

        def eval(self, text: str):  # noqa: D102 - UDTF contract
            toks = [t for t in (text or "").split(" ") if t]
            for i in range(0, len(toks), CHUNK_SIZE):
                chunk = toks[i : i + CHUNK_SIZE]
                yield i // CHUNK_SIZE, " ".join(chunk), len(chunk)

    _RET = "chunk_no: int, chunk_text: string, n_tokens: int"
    try:
        # Arrow-batched UDTF (ArrowEvalPythonUDTF): rows cross the
        # Python boundary in Arrow batches instead of pickled one at
        # a time -- same eval contract, same values, and it keeps the
        # registry's no-BatchEvalPython invariant intact
        # (tests/test_plans.py::test_registry_wide_scale_discipline).
        TokenChunks = udtf(_TokenChunks, returnType=_RET, useArrow=True)
    except Exception:  # pragma: no cover - pre-useArrow pyspark, or a
        # build where arrow-UDTF creation raises (e.g. ImportError for
        # missing pyarrow/pandas) instead of warning-and-falling-back:
        # ANY failure to build the Arrow variant must degrade to the
        # row-based UDTF, never lose the operator entirely (ADVICE r9
        # -- an ImportError here previously escaped to the outer
        # handler and nulled TokenChunks even though the non-Arrow
        # form worked).
        TokenChunks = udtf(_TokenChunks, returnType=_RET)

    HAS_UDTF = True
except ImportError:  # pragma: no cover
    TokenChunks = None
    HAS_UDTF = False
