"""Deterministic synthetic transcript tables with labeled, injected defects.

Analog of the reference's trimmed golden SQLite fixtures produced with a
fixed seed (/root/reference/notes/trim_input_todo.py:29-40, seed precedent
``random_seed = 2187`` /root/reference/dataval/dataval.py:79) and of its
sabotage parametrization (/root/reference/tests/test_run_package_release.py:207-245):
every generated value is a pure function of ``(seed, conv index, turn_idx)``
via xxhash64 — no RNG state, no wall clock — so any slice regenerates
identically at any scale and on any cluster.

Everything is built from Spark built-ins (``spark.range`` → per-conversation
row → ``posexplode(sequence(...))`` → expression columns): generation of
10^8 turns stays entirely inside whole-stage codegen, which is what lets the
scaling bench be compute-bound rather than Python-bound.

Schema (fixed by BASELINE.json input_hint):
    conv_id string, turn_idx int, role string, text string, tool string,
    ts timestamp
plus engine columns:
    part int           -- verdict partition, pmod(xxhash64(conv_id), n_parts)
                          (analog of the reference's (camera, ccd) grid)
    status int         -- conversation-level status enum (OK=1 .. ABORT=4),
                          analog of /root/reference/dataval/status.py:12-22
and, when ``with_labels=True``, a ``defects`` array<string> ground-truth
column for the pytest oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLES = ["system", "user", "assistant", "tool"]
TOOLS = ["search", "exec", "browse"]

# deterministic vocabulary for pseudo-text
WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
    "victor", "whiskey", "xray", "yankee", "zulu", "query", "result",
    "token", "stream", "batch", "vector", "window", "shuffle", "agg",
]

# role-conditional word-count envelope [lo, hi) for clean rows; the
# TextTooShort/TextTooLong constraints check length(text) against bounds
# derived from these (analog of the reference's magnitude-conditional
# bound curves, /root/reference/dataval/mag2flux.py:40-43).
ROLE_WORDS = {"system": (8, 24), "user": (4, 32), "assistant": (16, 96), "tool": (6, 40)}

# defect rates in units of 1/1000 rows (conversation- or turn-hash gated)
DEFECT_RATES = {
    "duplicate_turn": 8,
    "sequence_gap": 8,
    "ts_out_of_order": 8,
    "null_text": 6,
    "null_role": 5,
    "bad_role": 5,
    "bad_tool": 8,
    "tool_mismatch": 5,
    "too_long": 6,
    "too_short": 6,
    "bad_status_conv": 10,  # per-conversation
}

CLEAN_PART = 0    # partition guaranteed defect-free (verdict must pass)
DRIFT_PART = 1    # partition with shifted text-length distribution


def _h(*cols) -> F.Column:
    """Deterministic non-negative 63-bit hash of the given columns."""
    return F.abs(F.xxhash64(*cols))


def transcripts(
    spark: SparkSession,
    n_convs: int = 1000,
    seed: int = 2187,
    n_parts: int = 8,
    with_defects: bool = True,
    with_labels: bool = False,
    max_turns: int = 400,
    skew_convs: int = 0,
    skew_turns: int = 50_000,
) -> DataFrame:
    """Build the synthetic transcript DataFrame.

    ``skew_convs`` conversations are forced to ``skew_turns`` turns each to
    exercise the skew-handling path (heavy-tailed conversation sizes).
    """
    s = F.lit(seed)

    conv = (
        spark.range(n_convs)
        .withColumn("conv_id", F.format_string("conv-%012d", F.col("id")))
        .withColumn("_hc", _h(s, F.col("conv_id")))
    )
    # Heavy-tailed (Pareto-ish) turn counts: n = 2 + floor(2 / (1-u)^0.6)
    u = (F.col("_hc") % 100_000) / 100_000.0
    n_turns = F.least(
        F.lit(max_turns),
        (F.lit(2) + F.floor(F.lit(2.0) / F.pow(F.lit(1.0) - u + F.lit(1e-9), F.lit(0.6)))).cast("int"),
    )
    if skew_convs > 0:
        n_turns = F.when(F.col("id") < skew_convs, F.lit(skew_turns)).otherwise(n_turns)
    conv = (
        conv.withColumn("n_turns", n_turns)
        .withColumn("part", F.pmod(F.col("_hc"), F.lit(n_parts)).cast("int"))
        .withColumn("conv_start", (F.lit(1_600_000_000) + (F.col("_hc") % 200_000_000)).cast("long"))
    )

    bad_status_conv = (
        (_h(s, F.col("conv_id"), F.lit("status")) % 1000 < DEFECT_RATES["bad_status_conv"])
        & (F.col("part") != CLEAN_PART)
        & with_defects
    )
    # status enum: OK=1, WARNING=3 clean; ERROR=2/ABORT=4 forced-reject
    conv = conv.withColumn(
        "status",
        F.when(bad_status_conv, (F.lit(2) + (F.col("_hc") % 2) * 2).cast("int")).otherwise(
            F.when(_h(s, F.col("conv_id"), F.lit("warn")) % 10 == 0, F.lit(3)).otherwise(F.lit(1))
        ),
    )

    t = conv.select(
        "conv_id", "part", "status", "conv_start", "n_turns",
        F.posexplode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("_pos", "turn_idx"),
    ).drop("_pos")

    ht = _h(s, F.col("conv_id"), F.col("turn_idx"))

    # role: turn 0 = system, then user/assistant alternate, ~1/7 tool
    role = (
        F.when(F.col("turn_idx") == 0, F.lit("system"))
        .when(ht % 7 == 0, F.lit("tool"))
        .when(F.col("turn_idx") % 2 == 1, F.lit("user"))
        .otherwise(F.lit("assistant"))
    )
    t = t.withColumn("role", role)

    # deterministic pseudo-text, role-conditional length.
    # Implementation note (scale): text is a substring of a constant
    # word corpus at a hash-derived offset — plain string built-ins stay
    # inside whole-stage codegen, whereas a per-word
    # transform/element_at loop is an interpreted higher-order function
    # (~50x slower at 10^8 turns). Word-count envelope [lo,hi) maps to a
    # char length of 6*words, which sits strictly inside the
    # (3*lo-1, 9*hi) char bounds the Envelope constraint checks.
    corpus_words = [WORDS[(i * 7) % len(WORDS)] for i in range(400)]
    corpus = " ".join(corpus_words) + " "
    corpus = (corpus * 2)[: 6 * 200 + 600]  # long enough for any role max
    lo = F.create_map(*[y for r, (a, b) in ROLE_WORDS.items() for y in (F.lit(r), F.lit(a))])
    hi = F.create_map(*[y for r, (a, b) in ROLE_WORDS.items() for y in (F.lit(r), F.lit(b))])
    n_words = (lo[F.col("role")] + ht % (hi[F.col("role")] - lo[F.col("role")])).cast("int")
    n_chars = n_words * 6
    # drifted partition: systematically longer texts (distribution shift
    # the KS/PSI check must detect — analog of the reference's per-group
    # KDE comparison, /root/reference/dataval/mag_dist.py:41-47), capped
    # below the role envelope so TextTooLong does not fire
    if with_defects:
        n_chars = F.when(
            F.col("part") == DRIFT_PART,
            F.least(hi[F.col("role")] * 9 - 10, (n_chars * 1.45).cast("int")),
        ).otherwise(n_chars)
    # 6-char hash prefix varies content per turn; remainder from the corpus
    offset = (ht % 400).cast("int")
    text = F.concat(
        F.lpad(F.hex(ht % 1048576), 5, "0"),
        F.lit(" "),
        F.substring(F.lit(corpus), offset + 1, n_chars - 6),
    )
    t = t.withColumn("text", text)

    t = t.withColumn(
        "tool",
        F.when(F.col("role") == "tool", F.element_at(F.array(*[F.lit(x) for x in TOOLS]), (ht % 3 + 1).cast("int"))).otherwise(F.lit(None).cast("string")),
    )

    # strictly increasing ts: start + 300s/turn + jitter<300s
    t = t.withColumn(
        "ts",
        F.timestamp_seconds(F.col("conv_start") + F.col("turn_idx") * 300 + ht % 250),
    )

    if with_defects:
        t = _inject_defects(t, s, with_labels)
    elif with_labels:
        t = t.withColumn("defects", F.array().cast("array<string>"))

    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "part", "status"]
    if with_labels:
        cols.append("defects")
    return t.select(*cols)


def _inject_defects(t: DataFrame, s, with_labels: bool) -> DataFrame:
    """Apply labeled defect mutations. Gated off the clean partition."""
    ht = _h(s, F.col("conv_id"), F.col("turn_idx"))
    not_clean = F.col("part") != CLEAN_PART

    def gate(kind: str, extra=None) -> F.Column:
        g = (_h(s, F.col("conv_id"), F.col("turn_idx"), F.lit(kind)) % 1000 < DEFECT_RATES[kind]) & not_clean
        if extra is not None:
            g = g & extra
        return g

    mid = (F.col("turn_idx") > 0) & (F.col("turn_idx") < F.col("n_turns") - 1)
    g_ooo = gate("ts_out_of_order", F.col("turn_idx") > 0)
    g_null_text = gate("null_text")
    # duplicate copies must not co-occur with mutations that change on the
    # copy (NULL text survives concat_ws; shared mutated ts defeats the
    # strict-< monotonic check) — otherwise the copy inherits labels that
    # are no longer true of it and ground truth goes stale
    g_dup = gate("duplicate_turn", ~g_ooo & ~g_null_text)
    g_gap = gate("sequence_gap", mid)
    g_null_role = gate("null_role", F.col("turn_idx") > 0)
    g_bad_role = gate("bad_role", F.col("turn_idx") > 0)
    g_bad_tool = gate("bad_tool", F.col("role") == "tool")
    g_tool_mm = gate("tool_mismatch", F.col("role") != "tool")
    g_long = gate("too_long", ~g_null_text)
    g_short = gate("too_short", ~g_null_text & ~g_long)

    labels = F.filter(
        F.array(
            F.when(g_dup, F.lit("duplicate_turn")),
            F.when(g_gap, F.lit("sequence_gap")),
            F.when(g_ooo, F.lit("ts_out_of_order")),
            F.when(g_null_text, F.lit("null_text")),
            F.when(g_null_role, F.lit("null_role")),
            F.when(g_bad_role, F.lit("bad_role")),
            F.when(g_bad_tool, F.lit("bad_tool")),
            F.when(g_tool_mm, F.lit("tool_mismatch")),
            F.when(g_long, F.lit("too_long")),
            F.when(g_short, F.lit("too_short")),
            F.when((F.col("status") == 2) | (F.col("status") == 4), F.lit("bad_status_conv")),
        ),
        lambda x: x.isNotNull(),
    )

    t = (
        t.withColumn("_dup", g_dup)
        .withColumn("_gap", g_gap)
        .withColumn("text", F.when(g_null_text, F.lit(None)).when(g_long, F.repeat(F.col("text"), 30)).when(g_short, F.lit("ok")).otherwise(F.col("text")))
        .withColumn("role", F.when(g_null_role, F.lit(None)).when(g_bad_role, F.lit("robot")).otherwise(F.col("role")))
        .withColumn("tool", F.when(g_bad_tool, F.lit("warpdrive")).when(g_tool_mm, F.lit("search")).otherwise(F.col("tool")))
        .withColumn("ts", F.when(g_ooo, F.col("ts") - F.expr("INTERVAL 900 SECONDS")).otherwise(F.col("ts")))
    )
    if with_labels:
        t = t.withColumn("defects", labels)

    # sequence gap = drop the row (its successor's predecessor goes missing)
    t = t.filter(~F.col("_gap"))
    # duplicate turn = re-emit the row (same conv_id, turn_idx; text variant)
    dups = t.filter(F.col("_dup")).withColumn("text", F.concat_ws(" ", F.col("text"), F.lit("dup")))
    if with_labels:
        dups = dups.withColumn("defects", F.array_union(F.col("defects"), F.array(F.lit("duplicate_turn_copy"))))
    return t.unionByName(dups).drop("_dup", "_gap")
