"""AI column functions — the reference's custom-function surface (SURVEY §2.10).

Re-expresses Dremio's ``AI_GENERATE / AI_CLASSIFY / AI_COMPLETE``
(`/root/reference/industry-examples/logistics_AI.sql:126-141,188-198,220-240`,
``ai_generate.sql:5-23``, ``media_ai.sql:94-178``) as Arrow-batched pandas
UDFs with a pluggable backend:

- ``MockBackend`` — deterministic keyword rules, reproducible in plain SQL,
  used by tests and the correctness oracle.
- A real LLM backend plugs in through the same interface (HTTP calls batched
  per Arrow batch; rate limiting belongs in the backend, not the plan).

Design constraints carried over from the reference: AI functions run in the
silver layer and their outputs are materialized once (CTAS), never recomputed
per downstream query (``logistics_AI.sql:253-256``); ``ai_generate`` coerces
output into a typed struct exactly like ``WITH SCHEMA ROW(...)``
(``logistics_AI.sql:135-140``) and returns NULL fields on parse failure
rather than raising.

Scale: pandas_udf => one Python worker per core per executor, Arrow transfer,
vectorized batches. The UDFs are stateless and map-only — they scale linearly
and never shuffle.
"""

from __future__ import annotations

import re
from typing import Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

# --------------------------------------------------------------- tokenizer
# Must stay in lockstep with operators/textstats.normalized_text so SQL
# oracles can replicate mock outputs exactly.

_NONALPHA = re.compile(r"[^a-z ]")
_SPACES = re.compile(r" +")


def _norm_tokens(text: str) -> list[str]:
    t = _SPACES.sub(" ", _NONALPHA.sub(" ", (text or "").lower())).strip()
    return [w for w in t.split(" ") if w] if t else []


# --------------------------------------------------------------- backends


class MockBackend:
    """Deterministic keyword-rule 'LLM' (SURVEY §5: mock backend so AI
    functions are reproducible; rules chosen to be SQL-expressible)."""

    def classify(self, texts: pd.Series, labels: list[str]) -> pd.Series:
        def one(t: str) -> str:
            toks = _norm_tokens(t)
            best, best_n = "Unknown", 0
            for lab in labels:  # first label wins ties
                n = sum(1 for w in toks if w == lab.lower())
                if n > best_n:
                    best, best_n = lab, n
            return best

        return texts.map(one)

    def complete(self, prompts: pd.Series) -> pd.Series:
        return prompts.map(lambda p: f"echo[{len(p or '')}]:" + (p or "").strip()[:16].upper())

    def generate(self, prompts: pd.Series, fields: list[tuple[str, str]]) -> pd.DataFrame:
        """Typed-struct extraction. Field rules (deterministic):
        - summary: first 5 normalized tokens joined by ' '
        - n_words: token count
        - sentiment: 'positive'/'negative'/'neutral' by fast-vs-slow counts
        """
        out: dict[str, list] = {name: [] for name, _ in fields}
        for p in prompts:
            toks = _norm_tokens(p)
            for name, _typ in fields:
                if name == "summary":
                    out[name].append(" ".join(toks[:5]))
                elif name == "n_words":
                    out[name].append(len(toks))
                elif name == "sentiment":
                    pos = sum(1 for w in toks if w == "fast")
                    neg = sum(1 for w in toks if w == "slow")
                    out[name].append(
                        "positive" if pos > neg else ("negative" if neg > pos else "neutral")
                    )
                else:  # unknown field -> NULL (schema-coercion failure contract)
                    out[name].append(None)
        return pd.DataFrame(out)

    def generate_file(
        self, prompts: pd.Series, payloads: pd.Series, fields: list[tuple[str, str]]
    ) -> pd.DataFrame:
        """Multimodal extraction (AI2). Deterministic field rules over the
        raw bytes so outputs are test-pinnable without real decoders:
        - content_bytes: payload length
        - digest: first 8 hex chars of the payload's md5
        - summary: same rule as generate(), over the prompt text
        """
        import hashlib

        out: dict[str, list] = {name: [] for name, _ in fields}
        for p, payload in zip(prompts, payloads):
            raw = bytes(payload) if payload is not None else b""
            toks = _norm_tokens(p)
            for name, _typ in fields:
                if name == "content_bytes":
                    out[name].append(len(raw))
                elif name == "digest":
                    out[name].append(hashlib.md5(raw).hexdigest()[:8])
                elif name == "summary":
                    out[name].append(" ".join(toks[:5]))
                else:
                    out[name].append(None)
        return pd.DataFrame(out)


_BACKEND: MockBackend = MockBackend()


def set_backend(backend) -> None:
    """Swap the LLM backend (tests: MockBackend; prod: an HTTP-batched client
    with the same three methods)."""
    global _BACKEND
    _BACKEND = backend


# --------------------------------------------------------------- columns


def ai_classify(text: Column, labels: list[str]) -> Column:
    """AI_CLASSIFY(text, ARRAY[...]) -> closed-label StringType column
    (recipes.sql:18; ai_classify_examples.sql:31-35; logistics_AI.sql:188-198).
    The label set is enforced: output is one of ``labels`` or 'Unknown'."""

    @F.pandas_udf(StringType())
    def _udf(s: pd.Series) -> pd.Series:
        return _BACKEND.classify(s, labels)

    return _udf(text)


def ai_complete(prompt: Column) -> Column:
    """AI_COMPLETE(prompt) -> free-text VARCHAR ('intentionally simple',
    logistics_AI.sql:213,220-240)."""

    @F.pandas_udf(StringType())
    def _udf(s: pd.Series) -> pd.Series:
        return _BACKEND.complete(s)

    return _udf(prompt)


_TYPE_MAP = {"string": StringType(), "int": IntegerType()}


def ai_generate(prompt: Column, schema: list[tuple[str, str]]) -> Column:
    """AI_GENERATE(prompt WITH SCHEMA ROW(f1 T1, ...)) -> StructType column
    (logistics_AI.sql:126-141; ai_generate.sql:5-23). ``schema`` is a list of
    (field_name, 'string'|'int') pairs; unparseable fields come back NULL."""
    spark_schema = StructType([StructField(n, _TYPE_MAP[t]) for n, t in schema])

    @F.pandas_udf(spark_schema)
    def _udf(s: pd.Series) -> pd.DataFrame:
        return _BACKEND.generate(s, schema)

    return _udf(prompt)


def ai_generate_file(prompt: Column, content: Column, schema: list[tuple[str, str]]) -> Column:
    """AI_GENERATE('model', (prompt, file) WITH SCHEMA ROW(...)) — the
    multimodal variant: prompt + file bytes → typed struct
    (ai_generate.sql:5-23; logistics_AI.sql:328-358; media_ai.sql:229-257).

    Runs over ``LIST_FILES``/binaryFile rows (``sources.list_files``): the
    ``content`` column is the file payload Dremio passes as the ``file``
    handle (SURVEY §1.2). The mock backend derives deterministic fields from
    the bytes (length/digest prefix) so tests pin exact outputs; a real
    backend uploads the bytes alongside the JSON-schema-constrained prompt.
    Arrow-batched and map-only like every AI function — the bytes never
    shuffle."""
    spark_schema = StructType([StructField(n, _TYPE_MAP[t]) for n, t in schema])

    @F.pandas_udf(spark_schema)
    def _udf(prompts: pd.Series, payloads: pd.Series) -> pd.DataFrame:
        return _BACKEND.generate_file(prompts, payloads, schema)

    return _udf(prompt, content)
