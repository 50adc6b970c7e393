"""Declarative constraint DSL.

Each constraint is a small object contributing up to three things to ONE
shared plan (the reference runs 12 sequential SQL+numpy passes,
/root/reference/dataval/dataval.py:370-472 — here every check becomes
columns in the same DataFrame plan so the whole suite is a single scan +
one window shuffle + one aggregation shuffle):

* ``row_condition(df)`` — a boolean Column marking per-row violations;
  the suite ORs ``flag`` into the row's ``dataval`` bitmask where true
  (analog of the bit-OR executemany,
  /root/reference/dataval/dataval.py:347-367).
* ``agg_metrics()`` — aggregate expressions merged into the single wide
  ``groupBy(part).agg(...)`` pass (analog of the per-(camera,ccd)
  summary grid, /root/reference/dataval/dataval.py:424-471, but one
  pass instead of 32 queries).
* ``partition_fail_expr()`` — a boolean over the aggregated metrics row
  deciding partition-level failure (analog of the 5%/10% error-ratio
  gate, /root/reference/dataval/dataval.py:475-539).

Sequence-aware constraints (``needs_sequence``) read enrichment columns
``_prev_idx``, ``_prev_ts``, ``_next_idx`` that the suite computes with a
single window pass partitioned by conversation.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataval_spark.quality import QualityFlag


class Constraint:
    """Base class. Subclasses override what they contribute."""

    name: str = "constraint"
    flag: QualityFlag | None = None
    needs_sequence: bool = False

    def row_condition(self, df: DataFrame) -> Column | None:
        return None

    def helper_columns(self) -> dict[str, Column]:
        """Columns the suite materializes once in the PRE-SHUFFLE
        projection, so (a) agg expressions stay trivial column refs
        (codegen size) and (b) the window shuffle carries narrow derived
        values instead of raw wide columns (shuffle volume)."""
        return {}

    def wide_cols(self) -> list[str]:
        """Raw columns this constraint needs to survive past the narrow
        projection (widens the shuffle — avoid unless necessary)."""
        return []

    def agg_metrics(self) -> dict[str, Column]:
        """Aggregate expressions for the wide agg pass, keyed by alias.

        MUST be declarative aggregates only (sum/min/max/avg/count over
        simple expressions). TypedImperativeAggregates such as
        percentile_approx / approx_count_distinct force the whole
        aggregation into ObjectHashAggregateExec, which does NOT support
        whole-stage codegen — measured 8-10x slower for the fused pass.
        Quantiles are derived driver-side from the Drift histogram
        instead; HLL distinctness is opt-in (Stats.approx_distinct)."""
        return {}

    def partition_fail(self, metrics: dict) -> bool | None:
        """Driver-side partition gate over the collected metrics row."""
        return None

    def lag_helpers(self) -> list[str]:
        """Names of helper columns whose previous-row value (within the
        suite's one conversation window) this constraint needs; enrich
        adds each as ``_prev_<name>`` in the SAME window pass — no
        second shuffle."""
        return []

    def wants_conv_count(self) -> bool:
        """True when the constraint needs ``_conv_n`` (the conversation's
        total turn count). Computed as an unbounded-frame count over the
        window's partition key during enrich — reuses the existing
        Exchange, adds no shuffle."""
        return False

    def identity(self) -> dict:
        """Deterministic description of this constraint's configuration,
        used by the manifest settings guard (manifest.suite_hash).
        Includes every non-callable field value; callables (custom
        predicates, expressions) contribute their qualified name only."""
        out = {"cls": type(self).__name__, "name": self.name,
               "flag": int(self.flag) if self.flag else 0}
        for k, v in sorted(vars(self).items()):
            if k in out or k.startswith("_"):
                continue
            if callable(v):
                out[k] = getattr(v, "__qualname__", "callable")
            elif isinstance(v, (list, tuple)):
                out[k] = [str(x) for x in v]
            elif isinstance(v, dict):
                out[k] = {str(a): str(b) for a, b in sorted(v.items())}
            else:
                out[k] = str(v)
        return out


@dataclass
class NotNull(Constraint):
    """Column must be non-null (and non-empty for strings).

    Analog of the reference's NULL status / missing-lightcurve checks
    (/root/reference/dataval/dataval.py:497, cleanup.py:34).
    """

    col: str
    flag: QualityFlag | None = None
    empty_is_null: bool = True
    max_rate: float | None = None  # partition fails above this null rate

    def __post_init__(self):
        self.name = f"not_null_{self.col}"

    def row_condition(self, df: DataFrame) -> Column:
        c = F.col(self.col)
        cond = c.isNull()
        if self.empty_is_null and dict(df.dtypes).get(self.col) == "string":
            cond = cond | (F.length(c) == 0)
        return cond

    def helper_columns(self) -> dict[str, Column]:
        c = F.col(self.col)
        cond = c.isNull()
        if self.empty_is_null:
            # mirror row_condition: the partition gate must count the
            # same dirt the row flag counts, or empty-string dirt passes
            # a partition that NULL dirt would fail. cast('string') makes
            # the length probe type-safe for non-string columns (any
            # non-null value stringifies to length >= 1).
            cond = cond | (F.length(c.cast("string")) == 0)
        return {f"_nul_{self.col}": cond.cast("double")}

    def agg_metrics(self) -> dict[str, Column]:
        return {f"null_rate_{self.col}": F.avg(F.col(f"_nul_{self.col}"))}

    def partition_fail(self, metrics: dict) -> bool | None:
        if self.max_rate is None:
            return None
        rate = metrics.get(f"null_rate_{self.col}") or 0.0
        return rate > self.max_rate


@dataclass
class Unique(Constraint):
    """Composite-key uniqueness; flags EVERY member of a duplicate group
    (reference: ``GROUP BY ... HAVING COUNT(*) > 1``,
    /root/reference/dataval/camera_overlap.py:31).

    Detected inside the shared sequence window (a row equal in order-key
    to its predecessor or successor) — no extra shuffle.
    """

    keys: Sequence[str] = ("conv_id", "turn_idx")
    flag: QualityFlag | None = QualityFlag.DuplicateTurn
    needs_sequence: bool = True

    def __post_init__(self):
        self.name = "unique_" + "_".join(self.keys)

    def row_condition(self, df: DataFrame) -> Column:
        # keys must equal the suite's (conv_col, order_col): the window
        # enrichment is partitioned/ordered on those — Suite validates
        # this at construction time (suite.py) so a mismatched composite
        # key fails fast instead of silently never flagging.
        t = F.col(self.keys[-1])
        return (t == F.col("_prev_idx")) | (t == F.col("_next_idx"))


@dataclass
class SequenceIntegrity(Constraint):
    """turn_idx within a conversation must be gap-free starting at 0.

    Analog of the missing-diagnostics completeness anti-join
    (/root/reference/dataval/dataval.py:543-547): every expected member
    of the sequence must exist. Flags the row *after* a gap, and the
    first row when the prefix is missing.
    """

    order_col: str = "turn_idx"
    flag: QualityFlag | None = QualityFlag.SequenceGap
    needs_sequence: bool = True
    name: str = "sequence_integrity"

    def row_condition(self, df: DataFrame) -> Column:
        t = F.col(self.order_col)
        first_missing_prefix = F.col("_prev_idx").isNull() & (t > 0)
        gap = F.col("_prev_idx").isNotNull() & (t - F.col("_prev_idx") > 1)
        return first_missing_prefix | gap


@dataclass
class MonotonicTs(Constraint):
    """ts must not REGRESS within a conversation (flags strictly
    decreasing ts; equal consecutive timestamps are allowed — sub-second
    turns legitimately share a ts at second granularity). Analog of the
    cadence-vs-TIME consistency check
    (/root/reference/dataval/release.py:398-411)."""

    ts_col: str = "ts"
    flag: QualityFlag | None = QualityFlag.NonMonotonicTs
    needs_sequence: bool = True
    name: str = "monotonic_ts"

    def row_condition(self, df: DataFrame) -> Column:
        return F.col("_prev_ts").isNotNull() & (F.col(self.ts_col) < F.col("_prev_ts"))


@dataclass
class Domain(Constraint):
    """Column value must belong to a fixed domain — analog of the
    contamination domain check (/root/reference/dataval/contam.py:126-128)."""

    col: str = "role"
    values: Sequence[str] = ()
    flag: QualityFlag | None = None
    allow_null: bool = False

    def __post_init__(self):
        self.name = f"domain_{self.col}"

    def row_condition(self, df: DataFrame) -> Column:
        c = F.col(self.col)
        bad = ~c.isin(*self.values)
        if self.allow_null:
            return c.isNotNull() & bad
        return c.isNull() | bad

    def helper_columns(self) -> dict[str, Column]:
        c = F.col(self.col)
        return {f"_ood_{self.col}": (~c.isin(*self.values) & c.isNotNull()).cast("long")}

    def agg_metrics(self) -> dict[str, Column]:
        return {f"out_of_domain_{self.col}": F.sum(F.col(f"_ood_{self.col}"))}


@dataclass
class CrossField(Constraint):
    """Arbitrary cross-field consistency predicate (violation when the
    condition is true). Analog of the filename-fields-vs-row cross checks
    (/root/reference/dataval/release.py:206-221)."""

    name: str = "cross_field"
    condition: Callable[[DataFrame], Column] = None  # type: ignore[assignment]
    flag: QualityFlag | None = None

    def row_condition(self, df: DataFrame) -> Column:
        return self.condition(df)


@dataclass
class Envelope(Constraint):
    """Numeric expression must sit inside per-group bounds.

    Analog of the magnitude-conditional bound curves: value below the
    lower curve → Low flag, above the upper → High flag
    (/root/reference/dataval/mag2flux.py:151-153,
    /root/reference/dataval/pixinaperture.py:252-261). Bounds are a
    constant lookup per group value (piecewise curves fold to constants
    at plan time).
    """

    expr: Callable[[], Column] = None  # type: ignore[assignment]
    group_col: str = "role"
    bounds: dict[str, tuple[float, float]] = field(default_factory=dict)
    low_flag: QualityFlag | None = QualityFlag.TextTooShort
    high_flag: QualityFlag | None = QualityFlag.TextTooLong
    name: str = "envelope"

    @property
    def _helper(self) -> str:
        return f"_m_{self.name}"

    def helper_columns(self) -> dict[str, Column]:
        return {self._helper: self.expr()}

    # Envelope contributes two flags; the suite special-cases it.
    def low_condition(self, df: DataFrame) -> Column:
        lo = F.create_map(*[x for k, (a, b) in self.bounds.items() for x in (F.lit(k), F.lit(a))])
        v = self.expr()
        return (
            F.col(self.group_col).isin(*self.bounds.keys())
            & v.isNotNull()
            & (v < lo[F.col(self.group_col)])
        )

    def high_condition(self, df: DataFrame) -> Column:
        hi = F.create_map(*[x for k, (a, b) in self.bounds.items() for x in (F.lit(k), F.lit(b))])
        v = self.expr()
        return (
            F.col(self.group_col).isin(*self.bounds.keys())
            & v.isNotNull()
            & (v > hi[F.col(self.group_col)])
        )

    def agg_metrics(self) -> dict[str, Column]:
        v = F.col(self._helper)
        return {
            f"min_{self.name}": F.min(v),
            f"max_{self.name}": F.max(v),
            f"avg_{self.name}": F.avg(v),
        }


@dataclass
class StatusGate(Constraint):
    """Conversation-level status must be in the OK set; otherwise the row
    is force-rejected regardless of flag bits — the reference's final
    UPDATE override (/root/reference/dataval/dataval.py:404-413)."""

    col: str = "status"
    ok_values: Sequence[int] = (1, 3)  # OK, WARNING
    flag: QualityFlag | None = QualityFlag.BadStatus
    name: str = "status_gate"

    def row_condition(self, df: DataFrame) -> Column | None:
        if self.col not in df.columns:  # graceful degradation, see S4/§1.3
            return None
        # NULL status must reject (oracle parity): bare ~isin yields NULL
        # for NULL input, which would silently drop the row from both
        # n_approved and n_rejected
        c = F.col(self.col)
        return c.isNull() | ~c.isin(*self.ok_values)


@dataclass
class Stats(Constraint):
    """Pure metrics contributor (no flag): per-partition column stats —
    null rate, distinctness sketch, min/max. The 'single wide aggregation
    pass' members of the north rule."""

    col: str = "text"
    approx_distinct: bool = False
    name: str = "stats"

    def __post_init__(self):
        self.name = f"stats_{self.col}"

    def helper_columns(self) -> dict[str, Column]:
        return {f"_nul_{self.col}": F.col(self.col).isNull().cast("double")}

    def wide_cols(self) -> list[str]:
        # HLL needs the raw values — keeping them widens the shuffle
        return [self.col] if self.approx_distinct else []

    def agg_metrics(self) -> dict[str, Column]:
        out = {f"null_rate_{self.col}": F.avg(F.col(f"_nul_{self.col}"))}
        if self.approx_distinct:
            # HLL is a TypedImperativeAggregate: including it drops the
            # whole fused agg out of codegen (see class docstring) — only
            # enable when distinctness is actually needed.
            out[f"approx_distinct_{self.col}"] = F.approx_count_distinct(F.col(self.col))
        return out


def transition_violation(
    prev: Column, cur: Column, allowed: Sequence[str], has_prev: Column
) -> Column:
    """The transition-legality expression shared by RoleTransition and
    the q20 driver census: ``has_prev`` marks rows with a predecessor
    ROW (never derived from the predecessor's value — a NULL value
    mid-sequence must still count as a break); concat propagates NULL so
    either side NULL -> pair_ok NULL -> coalesce pins it to violation."""
    pair_ok = F.concat(prev, F.lit(">"), cur).isin(*allowed)
    return has_prev & ~F.coalesce(pair_ok, F.lit(False))


@dataclass
class RoleTransition(Constraint):
    """(previous role -> role) must be an allowed transition within the
    conversation — the dialogue-protocol face of sequence integrity
    (e.g. a tool turn only after an assistant turn). Evaluated against
    the suite's ONE conversation window via the generic lag-helper
    mechanism, so it adds no shuffle.

    ``allowed`` is the legal transition set as ``"prev>cur"`` strings.
    The first turn has no predecessor and is exempt here —
    ``ConversationShape(first_roles=...)`` owns conversation openings.
    A NULL role mid-conversation breaks the chain and is flagged (the
    NULL itself is additionally NotNull/Domain's business).

    Analog of the reference's cadence-vs-datasource consistency rules
    (/root/reference/dataval/release.py:398-411): a per-row value judged
    against its sequential context, not in isolation.
    """

    col: str = "role"
    allowed: Sequence[str] = ()
    flag: QualityFlag | None = QualityFlag.InvalidTransition
    needs_sequence: bool = True

    def __post_init__(self):
        self.name = f"role_transition_{self.col}"
        if not self.allowed:
            raise ValueError(
                "RoleTransition.allowed is empty — every transition would "
                "be flagged; list the legal 'prev>cur' pairs"
            )
        bad = [t for t in self.allowed if ">" not in t]
        if bad:
            raise ValueError(f"allowed entries must be 'prev>cur' strings: {bad}")

    def helper_columns(self) -> dict[str, Column]:
        return {f"_tr_{self.col}": F.col(self.col)}

    def lag_helpers(self) -> list[str]:
        return [f"_tr_{self.col}"]

    def row_condition(self, df: DataFrame) -> Column:
        cur = F.col(f"_tr_{self.col}")
        prev = F.col(f"_prev__tr_{self.col}")
        # "has a predecessor ROW" comes from _prev_idx, not from the
        # predecessor's role: a NULL role mid-conversation would
        # otherwise exempt the FOLLOWING row, hiding the second break of
        # the chain (NULL>assistant). (A NULL predecessor turn_idx is
        # indistinguishable from a first row here; NULL order keys are
        # SequenceIntegrity's business.)
        return transition_violation(
            prev, cur, self.allowed, F.col("_prev_idx").isNotNull()
        )


@dataclass
class ConversationShape(Constraint):
    """Conversation-level shape rules, evaluated without any extra
    shuffle: opening/closing role sets use the first/last-row markers
    the window pass already computes (``_prev_idx``/``_next_idx`` NULL),
    and turn-count bounds use ``_conv_n`` (an unbounded-frame count over
    the same window partition key — same Exchange).

    Flag targets: a bad opening flags the FIRST row, a bad closing flags
    the LAST row, and an out-of-bounds turn count flags EVERY row of the
    conversation (the whole conversation is the defect; per-row flags
    keep the verdict algebra row-local).

    Analog of the reference's per-target completeness checks — "does
    this target's file set have the expected shape"
    (/root/reference/dataval/dataval.py:543-547) — lifted to the
    conversation grain.
    """

    col: str = "role"
    first_roles: Sequence[str] | None = None
    last_roles: Sequence[str] | None = None
    min_turns: int | None = None
    max_turns: int | None = None
    flag: QualityFlag | None = QualityFlag.InvalidConvShape
    needs_sequence: bool = True
    name: str = "conversation_shape"

    def __post_init__(self):
        if (
            self.first_roles is None
            and self.last_roles is None
            and self.min_turns is None
            and self.max_turns is None
        ):
            raise ValueError("ConversationShape with no rules is vacuous")

    def helper_columns(self) -> dict[str, Column]:
        if self.first_roles is None and self.last_roles is None:
            return {}
        return {f"_cs_{self.col}": F.col(self.col)}

    def wants_conv_count(self) -> bool:
        return self.min_turns is not None or self.max_turns is not None

    def row_condition(self, df: DataFrame) -> Column:
        conds: list[Column] = []
        cur = F.col(f"_cs_{self.col}")
        if self.first_roles is not None:
            conds.append(
                F.col("_prev_idx").isNull()
                & ~F.coalesce(cur.isin(*self.first_roles), F.lit(False))
            )
        if self.last_roles is not None:
            conds.append(
                F.col("_next_idx").isNull()
                & ~F.coalesce(cur.isin(*self.last_roles), F.lit(False))
            )
        if self.min_turns is not None:
            conds.append(F.col("_conv_n") < F.lit(int(self.min_turns)))
        if self.max_turns is not None:
            conds.append(F.col("_conv_n") > F.lit(int(self.max_turns)))
        out = conds[0]
        for c in conds[1:]:
            out = out | c
        return out


@dataclass
class ResponseLatency(Constraint):
    """Inter-turn latency bounds within a conversation: flag the LATER
    turn when (ts - prev_ts) falls below ``min_seconds`` (machine-fast
    replies — the bot-spam signature in human-labeled transcripts) or
    above ``max_seconds`` (stale/spliced sessions that should have been
    two conversations). Rides the suite's existing ``_prev_ts`` window
    column — no extra shuffle, no helper lag.

    Evidence contract: a NULL ts on either side is InvalidTimestamp's
    business, never a latency violation; the first turn has no
    predecessor and is exempt. Bounds are inclusive-legal:
    ``min_seconds <= gap <= max_seconds`` passes. A NEGATIVE gap is
    MonotonicTs's violation; it only trips here when it also breaks
    ``min_seconds`` (min_seconds <= 0 keeps the two checks disjoint).

    ``roles``: restrict the check to turns whose own role is in the set
    (e.g. only assistant replies are latency-bounded; user think-time is
    unbounded). Analog of the reference's per-target elapsed-time
    diagnostic (/root/reference/dataval/calctime.py:14-40) turned into a
    per-row constraint.
    """

    min_seconds: float | None = None
    max_seconds: float | None = None
    ts_col: str = "ts"
    role_col: str = "role"
    roles: Sequence[str] | None = None
    flag: QualityFlag | None = QualityFlag.InvalidLatency
    needs_sequence: bool = True
    name: str = "response_latency"

    def __post_init__(self):
        if self.min_seconds is None and self.max_seconds is None:
            raise ValueError("ResponseLatency with no bounds is vacuous")
        if (
            self.min_seconds is not None
            and self.max_seconds is not None
            and self.min_seconds > self.max_seconds
        ):
            raise ValueError(
                f"min_seconds {self.min_seconds} > max_seconds "
                f"{self.max_seconds}"
            )

    def row_condition(self, df: DataFrame) -> Column:
        dtypes = dict(df.dtypes)

        def ep(col: str) -> Column:
            # TIMESTAMP_NTZ has no direct double cast (Spark 4); hop via
            # TIMESTAMP (session tz — the engine pins UTC) first
            c = F.col(col)
            if dtypes.get(col) == "timestamp_ntz":
                c = c.cast("timestamp")
            return c.cast("double")

        gap = ep(self.ts_col) - ep("_prev_ts")
        conds: list[Column] = []
        if self.min_seconds is not None:
            conds.append(gap < F.lit(float(self.min_seconds)))
        if self.max_seconds is not None:
            conds.append(gap > F.lit(float(self.max_seconds)))
        out = conds[0]
        for c in conds[1:]:
            out = out | c
        # NULL gap (either ts missing / no predecessor) -> no evidence
        out = F.col("_prev_ts").isNotNull() & F.col(self.ts_col).isNotNull() & out
        if self.roles is not None:
            out = out & F.coalesce(
                F.col(self.role_col).isin(*self.roles), F.lit(False)
            )
        return out

    def wide_cols(self) -> list[str]:
        # evaluated post-window (needs_sequence): the role column must
        # survive the narrow projection when the check is role-scoped
        return [self.role_col] if self.roles is not None else []


@dataclass
class JsonShape(Constraint):
    """Column must parse as a JSON OBJECT, optionally carrying required
    keys — the structured-payload face of domain validation for agent
    transcripts (tool-call arguments, tool results, metadata blobs ride
    transcript tables as JSON strings; a payload the trainer cannot
    parse is a rejected row, not a runtime surprise later).

    JVM-side only: one ``from_json`` to a string map (a non-object —
    scalar, array, malformed — parses to NULL) plus ``map_contains_key``
    per required key; no Python touches a row.

    ``when``: optional scope predicate (df -> Column); rows outside the
    scope are exempt (e.g. only role='tool' turns carry payloads).
    ``null_is_violation``: a NULL payload in scope violates by default
    (the payload is REQUIRED there); set False to allow absent payloads
    and validate shape only when present.

    Analog of the reference's per-file header/shape checks
    (/root/reference/dataval/special/check_sumimage.py:48-60) lifted to
    an in-row document format.
    """

    col: str = "props"
    required_keys: Sequence[str] = ()
    when: Callable[[DataFrame], Column] | None = None
    null_is_violation: bool = True
    flag: QualityFlag | None = QualityFlag.MalformedPayload
    name: str | None = None  # two shapes on one column need distinct names

    def __post_init__(self):
        if self.name is None:
            self.name = f"json_shape_{self.col}"

    def row_condition(self, df: DataFrame) -> Column:
        c = F.col(self.col)
        parsed = F.from_json(c, "map<string,string>")
        bad = parsed.isNull()  # unparseable or not an object
        for k in self.required_keys:
            bad = bad | ~F.map_contains_key(parsed, F.lit(k))
        if self.null_is_violation:
            out = c.isNull() | bad
        else:
            out = c.isNotNull() & bad
        if self.when is not None:
            out = F.coalesce(self.when(df), F.lit(False)) & out
        return out
