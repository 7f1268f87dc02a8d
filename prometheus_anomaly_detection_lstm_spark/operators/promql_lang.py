"""PromQL query-string compiler: parse a PromQL subset, lower to plans.

The reference configures its pipelines as PromQL STRINGS
(config.yaml:17-25) and ships them to a Prometheus server
(data_collector.py:41-48).  operators/promql.py re-implements the
function families as batch operators; this module closes the remaining
surface gap — the STRING interface itself — so a reference user can
paste their config queries and run them against samples stored in the
lake:

    from prometheus_anomaly_detection_lstm_spark.operators import promql_lang
    df = promql_lang.eval_promql(
        'sum by (label) (rate(events_total{label=~"[0-3]"}[10m]))',
        samples,            # (ts, value, seq, metric, *label columns)
    )

Supported grammar (documented subset, recursive descent):

    expr      := or_expr binop scalar | scalar binop or_expr | or_expr
    or_expr   := agg | func | selector | '(' expr ')'
    agg       := AGGOP [group-clause] '(' expr ')' [group-clause]
                 (group-clause := ('by' | 'without') '(' labels ')')
               | ('topk' | 'bottomk') '(' INT ',' expr ')'
               | 'histogram_quantile' '(' NUM ',' 'rate' '('
                   selector-with-range ')' ')'
               | 'quantile_over_time' '(' NUM ','
                   selector-with-range ')'
               | MATHFN '(' expr [',' NUM] ')'
                 (MATHFN := abs|ceil|floor|sqrt|exp|ln|log2|sgn
                          | round|clamp_min|clamp_max — elementwise)
               | 'label_replace' '(' expr ',' STR ',' STR ',' STR ','
                   STR ')'
               | 'label_join' '(' expr ',' STR ',' STR ',' STR... ')'
    AGGOP     := sum | avg | min | max | count | stddev | stdvar
               | quantile '(' NUM ',' expr ')'  (exact interpolated)
    func      := FUNC '(' selector-with-range ')'
               | 'predict_linear' '(' selector-with-range ',' NUM ')'
    FUNC      := rate | irate | increase | resets | changes | delta
               | deriv
               | avg_over_time | min_over_time | max_over_time
               | sum_over_time | count_over_time | last_over_time
               | stddev_over_time | stdvar_over_time
               | absent  (value=1 for selector-empty buckets over
                          the corpus' observed range)
    selector  := NAME ['{' matcher (',' matcher)* '}'] ['[' DURATION ']']
                 ['offset' DURATION]
    matcher   := LABEL ('=' | '!=' | '=~' | '!~') STRING
    binop     := + - * / > >= < <=  (comparisons FILTER, PromQL-style;
                 `bool` modifier -> 0/1 result, nothing filtered)
               | and | or | unless  (set ops: semi/union/anti on the
                 matched labelset per bucket; left samples win `or`)
                 vector binop scalar | scalar binop vector
               | vector binop ['on' '(' labels ')' |
                               'ignoring' '(' labels ')'] vector
                 (1:1 matching; __name__ dropped before matching;
                  x/0 -> SQL NULL)

Batch semantics: a range selector evaluates per (series, tumbling
bucket of the range duration) — the module's exact-bucket convention
(see operators/promql.py header: exact increase, PromQL reset
handling, no edge extrapolation).  A bare instant selector evaluates
to the LAST sample per (series, DEFAULT_STEP_S bucket) — the batch
twin of PromQL's staleness lookback at step resolution.  ``offset d``
shifts samples forward by ``d`` so the value reported at t is the
series' value at t - d, exactly PromQL's offset.

Scale notes (100 TB): lowering targets the existing operators — the
only data-proportional exchanges are the per-series lag window inside
``counter_rate`` and one hash aggregation per grouping; ``topk`` ranks
inside each time bucket (hashpartitioning(w_start), never a global
sort).  Matcher pushdown: selector filters are plain Catalyst
predicates on the samples scan, so metric/label pruning reaches the
parquet reader.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .promql import counter_rate

#: instant-vector resolution (PromQL "step") for bare selectors.
DEFAULT_STEP_S = 600

_DURATION_UNITS = {"s": 1, "m": 60, "h": 3600, "d": 86400}

_TOKEN_RE = re.compile(
    r"""\s*(?:
      (?P<num>\d+(?:\.\d+)?)(?P<unit>[smhd])?
    | (?P<name>[A-Za-z_:][A-Za-z0-9_:]*)
    | (?P<str>"(?:[^"\\]|\\.)*")
    | (?P<op><=|>=|!=|=~|!~|[-+*/<>=(){}\[\],])
    )""",
    re.X,
)

AGG_OPS = {"sum", "avg", "min", "max", "count", "stddev", "stdvar"}
RANGE_FUNCS = {
    "rate", "irate", "increase", "resets", "changes", "delta", "deriv",
    "avg_over_time", "min_over_time", "max_over_time",
    "sum_over_time", "count_over_time", "last_over_time",
    "stddev_over_time", "stdvar_over_time", "absent",
}


@dataclass
class Selector:
    metric: str
    matchers: list[tuple[str, str, str]] = field(default_factory=list)
    range_s: int | None = None
    offset_s: int = 0


@dataclass
class Func:
    name: str
    arg: Selector


@dataclass
class Agg:
    op: str
    by: list[str]
    arg: object
    k: int | None = None
    #: PromQL ``without (labels)``: group by every label EXCEPT these
    #: (and __name__, which without always drops).
    without: list[str] = field(default_factory=list)
    #: quantile aggregator's phi (exact interpolated estimate — the
    #: PromQL quantile() definition, percentile() is bit-identical)
    phi: float | None = None


@dataclass
class BinOp:
    op: str
    expr: object
    scalar: float
    scalar_left: bool = False
    #: PromQL `bool` modifier: comparisons return 0/1 instead of
    #: filtering the vector
    bool_mode: bool = False


#: elementwise vector math: name -> value-column transform
MATH_FUNCS = {
    "abs": lambda v, _: F.abs(v),
    "ceil": lambda v, _: F.ceil(v).cast("double"),
    "floor": lambda v, _: F.floor(v).cast("double"),
    "sqrt": lambda v, _: F.sqrt(v),
    "exp": lambda v, _: F.exp(v),
    "ln": lambda v, _: F.log(v),
    "log2": lambda v, _: F.log2(v),
    "clamp_min": lambda v, s: F.greatest(v, F.lit(s)),
    "clamp_max": lambda v, s: F.least(v, F.lit(s)),
    # PromQL round(v, to=1): nearest multiple of `to`, TIES ROUND UP —
    # Prometheus computes floor(v/to + 0.5) * to, so -7.5 rounds to -7,
    # not -8 (half-away).  Built from floor explicitly for that reason.
    "round": lambda v, s: F.floor(v / F.lit(s or 1.0) + F.lit(0.5))
    * F.lit(s or 1.0),
    "sgn": lambda v, _: F.signum(v),
}


@dataclass
class MathFn:
    """Elementwise math over a vector expression; ``scalar`` only for
    clamp_min/clamp_max.  ln/log2/sqrt of out-of-domain values yield
    SQL NULL (Spark semantics) rather than PromQL's NaN — the engine's
    NULL convention, applied consistently."""

    name: str
    arg: object
    scalar: float | None = None


@dataclass
class LabelFn:
    """``label_replace(v, dst, repl, src, regex)`` / ``label_join(v,
    dst, sep, l1, ...)``.  label_replace follows PromQL exactly: the
    regex must match the src label's WHOLE value; on match dst becomes
    the replacement with $1..$n capture substitution, otherwise dst is
    left as-is (empty string when dst doesn't exist yet)."""

    name: str
    arg: object
    args: list[str] = field(default_factory=list)


@dataclass
class QuantOT:
    """``quantile_over_time(q, sel[d])`` — exact interpolated
    phi-quantile per (series, bucket), PromQL's estimator (percentile()
    and DuckDB quantile_cont are bit-identical to it)."""

    q: float
    sel: Selector


@dataclass
class HistQ:
    """``histogram_quantile(q, rate(sel[d]))`` — lowered onto the batch
    operator (operators/promql.histogram_quantile): samples bucket into
    the cumulative ``le`` slots and the crossing slot interpolates
    linearly, PromQL's estimator including both edge rules.  Non-le
    labels collapse per metric (PromQL's sum-without-by convention for
    the canonical usage)."""

    q: float
    sel: Selector


@dataclass
class PredictLinear:
    """``predict_linear(sel[d], t)`` — least-squares slope per
    (series, bucket) extrapolated ``horizon_s`` past the bucket end,
    anchored at the bucket's last sample (the batch
    operators/promql.deriv_predict semantics)."""

    horizon_s: float
    sel: Selector


@dataclass
class VecBinOp:
    """Vector-vector binary op with 1:1 label matching.

    ``on`` is None (match on ALL shared label columns, metric name
    dropped first — PromQL drops __name__ before matching) or a tuple
    ("on" | "ignoring", labels).  Arithmetic joins the two vectors
    inner on (match labels, w_start); comparisons keep the LEFT
    vector's rows where the comparison holds (PromQL filter
    semantics).  Division yields SQL NULL on zero denominators (the
    SQL-friendly stand-in for PromQL's NaN/Inf).  Matching is strict
    1:1 per (labelset, bucket) — group modifiers are out of scope.
    Set ops (and/or/unless) use the same matched labelset: `and` is a
    left-semi join, `unless` left-anti, `or` keeps every left sample
    and fills from the right where the labelset is absent."""

    op: str
    left: object
    right: object
    on: tuple[str, list[str]] | None = None
    bool_mode: bool = False


def tokenize(s: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m or m.end() == pos:
            if s[pos:].strip() == "":
                break
            raise ValueError(f"PromQL tokenize error at: {s[pos:pos + 20]!r}")
        pos = m.end()
        if m.group("num") is not None:
            if m.group("unit"):
                out.append(("dur", m.group("num") + m.group("unit")))
            else:
                out.append(("num", m.group("num")))
        elif m.group("name") is not None:
            out.append(("name", m.group("name")))
        elif m.group("str") is not None:
            out.append(("str", m.group("str")[1:-1].replace('\\"', '"')))
        else:
            out.append(("op", m.group("op")))
    return out


def _duration_s(tok: tuple[str, str]) -> int:
    kind, text = tok
    if kind == "dur":
        return int(float(text[:-1]) * _DURATION_UNITS[text[-1]])
    if kind == "num":
        return int(float(text))
    raise ValueError(f"expected duration, got {text!r}")


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> tuple[str, str] | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> tuple[str, str]:
        tok = self.peek()
        if tok is None:
            raise ValueError("unexpected end of PromQL expression")
        self.i += 1
        return tok

    def expect(self, text: str) -> None:
        tok = self.next()
        if tok[1] != text:
            raise ValueError(f"expected {text!r}, got {tok[1]!r}")

    def scalar(self, what: str) -> float:
        """A numeric literal with optional leading minus ('-' tokenizes
        as an operator, so negative bounds need this)."""
        sign = 1.0
        tok = self.next()
        if tok == ("op", "-"):
            sign = -1.0
            tok = self.next()
        if tok[0] != "num":
            raise ValueError(f"{what} needs a scalar, got {tok[1]!r}")
        return sign * float(tok[1])

    # ------------------------------------------------------ grammar

    def parse(self):
        node = self._maybe_binop_left()
        if self.peek() is not None:
            raise ValueError(f"trailing tokens: {self.toks[self.i:]}")
        return node

    def _maybe_binop_left(self):
        tok = self.peek()
        if tok and tok[0] == "num":  # scalar on the left: 2 * expr
            scalar = float(self.next()[1])
            op = self.next()[1]
            expr = self._primary()
            return BinOp(op, expr, scalar, scalar_left=True)
        expr = self._primary()
        tok = self.peek()
        is_set_op = tok and tok[0] == "name" and tok[1] in {"and", "or", "unless"}
        if is_set_op or (
            tok and tok[0] == "op" and tok[1] in {"+", "-", "*", "/", ">", ">=", "<", "<="}
        ):
            op = self.next()[1]
            bool_mode = False
            nxt = self.peek()
            if (
                op in {">", ">=", "<", "<="}
                and nxt
                and nxt == ("name", "bool")
            ):
                self.next()
                bool_mode = True
            on = None
            nxt = self.peek()
            if nxt and nxt[0] == "name" and nxt[1] in {"on", "ignoring"}:
                kind = self.next()[1]
                self.expect("(")
                labels = []
                while self.peek() and self.peek()[1] != ")":
                    labels.append(self.next()[1])
                    if self.peek() and self.peek()[1] == ",":
                        self.next()
                self.expect(")")
                if kind == "ignoring":
                    on = ("ignoring", labels)
                else:
                    on = ("on", labels)
                nxt = self.peek()
                # group_left/group_right: accepted and recorded — the
                # underlying equi-join is naturally many-to-one, so the
                # modifier needs no special physical handling (the
                # optional carry-label list is consumed too)
                if nxt and nxt[0] == "name" and nxt[1] in {
                    "group_left",
                    "group_right",
                }:
                    self.next()
                    if self.peek() and self.peek()[1] == "(":
                        self.next()
                        while self.peek() and self.peek()[1] != ")":
                            self.next()
                        self.expect(")")
            nxt = self.peek()
            if (
                on is None
                and not is_set_op
                and nxt
                and (nxt[0] == "num" or nxt == ("op", "-"))
            ):
                return BinOp(
                    op, expr, self.scalar("right operand"),
                    bool_mode=bool_mode,
                )
            rhs = self._primary()
            return VecBinOp(op, expr, rhs, on=on, bool_mode=bool_mode)
        return expr

    def _primary(self):
        tok = self.peek()
        if tok is None:
            raise ValueError("unexpected end of PromQL expression")
        if tok[1] == "(":
            self.next()
            node = self._maybe_binop_left()
            self.expect(")")
            return node
        if tok[0] == "name" and tok[1] in {"label_replace", "label_join"}:
            name = self.next()[1]
            self.expect("(")
            arg = self._maybe_binop_left()
            strs = []
            while self.peek() and self.peek()[1] == ",":
                self.next()
                s_tok = self.next()
                if s_tok[0] != "str":
                    raise ValueError(f"{name} args after the vector are strings")
                strs.append(s_tok[1])
            self.expect(")")
            if name == "label_replace" and len(strs) != 4:
                raise ValueError(
                    "label_replace needs exactly 4 string args "
                    f"(dst, replacement, src, regex), got {len(strs)}"
                )
            if name == "label_join" and len(strs) < 3:
                raise ValueError(
                    "label_join needs at least 3 string args (dst, sep, l1...)"
                )
            return LabelFn(name, arg, strs)
        if tok[0] == "name" and tok[1] in MATH_FUNCS:
            name = self.next()[1]
            self.expect("(")
            arg = self._maybe_binop_left()
            scalar = None
            if name in {"clamp_min", "clamp_max"}:
                self.expect(",")
                scalar = self.scalar(f"{name} bound")
            elif name == "round" and self.peek() and self.peek()[1] == ",":
                self.next()
                scalar = self.scalar("round to-nearest")
                if scalar == 0:
                    raise ValueError("round() to-nearest must be non-zero")
            self.expect(")")
            return MathFn(name, arg, scalar)
        if tok[0] == "name" and tok[1] == "quantile_over_time":
            self.next()
            self.expect("(")
            q_tok = self.next()
            if q_tok[0] != "num":
                raise ValueError("quantile_over_time needs a scalar q")
            self.expect(",")
            sel = self._selector()
            self.expect(")")
            if sel.range_s is None:
                raise ValueError("quantile_over_time needs a range selector")
            q = float(q_tok[1])
            if not 0.0 <= q <= 1.0:
                raise ValueError(f"quantile_over_time q must be in [0, 1], got {q}")
            return QuantOT(q, sel)
        if tok[0] == "name" and tok[1] == "histogram_quantile":
            self.next()
            self.expect("(")
            q_tok = self.next()
            if q_tok[0] != "num":
                raise ValueError("histogram_quantile needs a scalar q")
            self.expect(",")
            self.expect("rate")
            self.expect("(")
            sel = self._selector()
            self.expect(")")
            self.expect(")")
            if sel.range_s is None:
                raise ValueError("histogram_quantile needs a range selector")
            q = float(q_tok[1])
            if not 0.0 <= q <= 1.0:
                raise ValueError(f"histogram_quantile q must be in [0, 1], got {q}")
            return HistQ(q, sel)
        if tok[0] == "name" and tok[1] == "predict_linear":
            self.next()
            self.expect("(")
            sel = self._selector()
            self.expect(",")
            t_tok = self.next()
            if t_tok[0] != "num":
                raise ValueError("predict_linear needs a scalar horizon")
            self.expect(")")
            if sel.range_s is None:
                raise ValueError("predict_linear needs a range selector")
            return PredictLinear(float(t_tok[1]), sel)
        if tok[0] == "name" and tok[1] == "quantile":
            self.next()
            by, without = self._grouping_clause()
            self.expect("(")
            q_tok = self.next()
            if q_tok[0] != "num":
                raise ValueError("quantile needs a scalar phi")
            self.expect(",")
            arg = self._maybe_binop_left()
            self.expect(")")
            if not by and not without:
                by, without = self._grouping_clause()
            phi = float(q_tok[1])
            if not 0.0 <= phi <= 1.0:
                raise ValueError(f"quantile phi must be in [0, 1], got {phi}")
            return Agg("quantile", by, arg, k=None, without=without, phi=phi)
        if tok[0] == "name" and tok[1] in {"topk", "bottomk"}:
            op = self.next()[1]
            self.expect("(")
            k_tok = self.next()
            self.expect(",")
            arg = self._maybe_binop_left()
            self.expect(")")
            return Agg(op, [], arg, k=int(k_tok[1]))
        if tok[0] == "name" and tok[1] in AGG_OPS:
            op = self.next()[1]
            by, without = self._grouping_clause()
            self.expect("(")
            arg = self._maybe_binop_left()
            self.expect(")")
            if not by and not without:
                by, without = self._grouping_clause()
            return Agg(op, by, arg, without=without)
        if tok[0] == "name" and tok[1] in RANGE_FUNCS:
            name = self.next()[1]
            self.expect("(")
            sel = self._selector()
            self.expect(")")
            if sel.range_s is None:
                raise ValueError(f"{name}() requires a range selector [d]")
            return Func(name, sel)
        return self._selector()

    def _grouping_clause(self) -> tuple[list[str], list[str]]:
        """(by_labels, without_labels) — at most one side non-empty."""
        tok = self.peek()
        if tok and tok[0] == "name" and tok[1] in {"by", "without"}:
            kind = self.next()[1]
            self.expect("(")
            labels = []
            while True:
                labels.append(self.next()[1])
                if self.peek() and self.peek()[1] == ",":
                    self.next()
                    continue
                break
            self.expect(")")
            return ([], labels) if kind == "without" else (labels, [])
        return [], []

    def _selector(self) -> Selector:
        name_tok = self.next()
        if name_tok[0] != "name":
            raise ValueError(f"expected metric name, got {name_tok[1]!r}")
        sel = Selector(metric=name_tok[1])
        if self.peek() and self.peek()[1] == "{":
            self.next()
            while self.peek() and self.peek()[1] != "}":
                label = self.next()[1]
                op = self.next()[1]
                if op not in {"=", "!=", "=~", "!~"}:
                    raise ValueError(f"bad matcher op {op!r}")
                val = self.next()
                if val[0] != "str":
                    raise ValueError("matcher value must be a string")
                sel.matchers.append((label, op, val[1]))
                if self.peek() and self.peek()[1] == ",":
                    self.next()
            self.expect("}")
        if self.peek() and self.peek()[1] == "[":
            self.next()
            sel.range_s = _duration_s(self.next())
            self.expect("]")
        if self.peek() and self.peek()[1] == "offset":
            self.next()
            sel.offset_s = _duration_s(self.next())
        return sel


def parse(query: str):
    """PromQL string -> AST."""
    return _Parser(tokenize(query)).parse()


# ------------------------------------------------------------ evaluator

def _series_cols(samples: DataFrame) -> list[str]:
    return [
        c for c in samples.columns if c not in {"ts", "value", "seq"}
    ]


def _apply_selector(samples: DataFrame, sel: Selector) -> DataFrame:
    """Matcher predicates + offset shift — plain Catalyst filters, so
    metric/label pruning pushes to the scan."""
    df = samples.filter(F.col("metric") == sel.metric)
    for label, op, val in sel.matchers:
        col = F.col(label).cast("string")
        if op == "=":
            df = df.filter(col == val)
        elif op == "!=":
            df = df.filter(col != val)
        elif op == "=~":
            df = df.filter(col.rlike(f"^(?:{val})$"))
        else:
            df = df.filter(~col.rlike(f"^(?:{val})$"))
    if sel.offset_s:
        df = df.withColumn(
            "ts", F.col("ts") + F.expr(f"INTERVAL {sel.offset_s} SECONDS")
        )
    return df


_OVER_TIME = {
    "avg_over_time": lambda: F.avg("value"),
    "min_over_time": lambda: F.min("value"),
    "max_over_time": lambda: F.max("value"),
    "sum_over_time": lambda: F.sum("value"),
    "count_over_time": lambda: F.count("value").cast("double"),
    "last_over_time": lambda: F.expr(
        "max_by(value, named_struct('t', ts, 's', seq))"
    ),
    # PromQL stddev/stdvar are POPULATION moments
    "stddev_over_time": lambda: F.stddev_pop("value"),
    "stdvar_over_time": lambda: F.var_pop("value"),
}


def _eval(node, samples: DataFrame) -> DataFrame:
    """AST -> DataFrame with columns (*series/group cols, w_start, value)."""
    series = _series_cols(samples)
    if isinstance(node, Selector):
        df = _apply_selector(samples, node)
        step = node.range_s or DEFAULT_STEP_S
        return df.groupBy(
            *series, F.window("ts", f"{step} seconds").start.alias("w_start")
        ).agg(_OVER_TIME["last_over_time"]().alias("value"))
    if isinstance(node, Func) and node.name == "absent":
        # value=1 for every bucket in the CORPUS' observed range where
        # the selector matches nothing — the dead-exporter alert.
        # Bounds come from the unfiltered samples (a fully dead series
        # must still be reported over the live corpus' clock).
        from .promql import bucket_span

        bucket = node.arg.range_s
        filtered = _apply_selector(samples, node.arg)
        observed = filtered.select(
            F.window("ts", f"{bucket} seconds").start.alias("w_start")
        ).distinct()
        grid = bucket_span(samples, bucket)
        return grid.join(observed, "w_start", "left_anti").select(
            F.lit(node.arg.metric).alias("metric"),
            "w_start",
            F.lit(1.0).alias("value"),
        )
    if isinstance(node, PredictLinear) or (
        isinstance(node, Func) and node.name == "deriv"
    ):
        sel = node.sel if isinstance(node, PredictLinear) else node.arg
        df = _apply_selector(samples, sel)
        from ..functions import ntz_epoch_seconds

        based = df.withColumn(
            "w_start",
            F.window("ts", f"{sel.range_s} seconds").start,
        ).withColumn(
            "__t", ntz_epoch_seconds("ts") - ntz_epoch_seconds("w_start")
        )
        slope = F.covar_pop("value", "__t") / F.expr("nullif(var_pop(__t), 0D)")
        last = F.expr(
            "max_by(named_struct('v', value, 't', __t), "
            "named_struct('t', ts, 's', seq))"
        )
        agg = based.groupBy(*series, "w_start").agg(
            slope.alias("__slope"), last.alias("__last")
        )
        if isinstance(node, Func):  # deriv
            return agg.select(
                *series, "w_start", F.col("__slope").alias("value")
            )
        pred = F.col("__last.v") + F.col("__slope") * (
            F.lit(float(sel.range_s) + float(node.horizon_s))
            - F.col("__last.t")
        )
        return agg.select(*series, "w_start", pred.alias("value"))
    if isinstance(node, Func):
        df = _apply_selector(samples, node.arg)
        if node.name == "changes":
            from .promql import changes_resets

            out = changes_resets(
                df, bucket_s=node.arg.range_s, series_cols=tuple(series)
            )
            return out.select(
                *series,
                "w_start",
                F.col("changes").cast("double").alias("value"),
            )
        if node.name in {"rate", "irate", "increase", "resets"}:
            rates = counter_rate(
                df, bucket_s=node.arg.range_s, series_cols=tuple(series)
            )
            value = {
                "rate": F.col("rate_per_s"),
                "irate": F.col("irate_per_s"),
                "increase": F.col("increase"),
                "resets": F.col("n_resets").cast("double"),
            }[node.name]
            return rates.select(*series, "w_start", value.alias("value"))
        grouped = df.groupBy(
            *series,
            F.window("ts", f"{node.arg.range_s} seconds").start.alias(
                "w_start"
            ),
        )
        if node.name == "delta":
            first_v = F.expr("min_by(value, named_struct('t', ts, 's', seq))")
            last_v = F.expr("max_by(value, named_struct('t', ts, 's', seq))")
            return grouped.agg((last_v - first_v).alias("value"))
        return grouped.agg(_OVER_TIME[node.name]().alias("value"))
    if isinstance(node, Agg):
        inner = _eval(node.arg, samples)
        if node.op in {"topk", "bottomk"}:
            keys = [c for c in inner.columns if c not in {"w_start", "value"}]
            # NULL samples (undefined increase/out-of-domain math) are
            # not in the vector at all — PromQL has no missing samples
            inner = inner.filter(F.col("value").isNotNull())
            head = (
                F.desc_nulls_last("value")
                if node.op == "topk"
                else F.asc_nulls_last("value")
            )
            rank = F.row_number().over(
                Window.partitionBy("w_start").orderBy(
                    head, *[F.asc(k) for k in keys]
                )
            )
            return inner.withColumn("__rk", rank).filter(
                F.col("__rk") <= node.k
            ).drop("__rk")
        if node.op == "quantile":
            agg_col: Column = F.expr(f"percentile(value, {node.phi}D)")
        else:
            agg_col = {
                "sum": F.sum("value"),
                "avg": F.avg("value"),
                "min": F.min("value"),
                "max": F.max("value"),
                "count": F.count("value").cast("double"),
                "stddev": F.stddev_pop("value"),
                "stdvar": F.var_pop("value"),
            }[node.op]
        group = node.by
        if node.without:
            group = [
                c
                for c in inner.columns
                if c not in {"w_start", "value", "metric"}
                and c not in node.without
            ]
        return inner.groupBy(*group, "w_start").agg(agg_col.alias("value"))
    if isinstance(node, LabelFn):
        inner = _eval(node.arg, samples)
        if node.name == "label_replace":
            dst, repl, src, regex = node.args[:4]
            # PromQL's regexp.Expand tolerates a literal '$' (only
            # $<digit> is a capture ref); Java's appendReplacement
            # throws mid-job on it — escape the non-ref dollars
            repl = re.sub(r"\$(?!\d)", r"\\$", repl)
            full = f"^(?:{regex})$"
            src_col = (
                F.col(src).cast("string")
                if src in inner.columns
                else F.lit("")
            )
            old_dst = (
                F.col(dst).cast("string")
                if dst in inner.columns
                else F.lit("")
            )
            new_dst = F.when(
                src_col.rlike(full), F.regexp_replace(src_col, full, repl)
            ).otherwise(old_dst)
            return inner.withColumn(dst, new_dst)
        dst, sep, *labels = node.args
        return inner.withColumn(
            dst,
            F.concat_ws(
                sep,
                *[
                    F.col(l).cast("string")
                    if l in inner.columns
                    else F.lit("")
                    for l in labels
                ],
            ),
        )
    if isinstance(node, MathFn):
        inner = _eval(node.arg, samples)
        return inner.withColumn(
            "value", MATH_FUNCS[node.name](F.col("value"), node.scalar)
        )
    if isinstance(node, QuantOT):
        df = _apply_selector(samples, node.sel)
        return df.groupBy(
            *series,
            F.window("ts", f"{node.sel.range_s} seconds").start.alias(
                "w_start"
            ),
        ).agg(F.expr(f"percentile(value, {node.q!r}D)").alias("value"))
    if isinstance(node, HistQ):
        from .promql import histogram_quantile as _hq

        df = _apply_selector(samples, node.sel).select("metric", "ts", "value")
        out = _hq(df, q=node.q, bucket_s=node.sel.range_s)
        return out.select(
            "metric",
            "w_start",
            F.col(f"p{int(node.q * 100)}_est").alias("value"),
        )
    if isinstance(node, VecBinOp):
        lhs = _eval(node.left, samples)
        rhs = _eval(node.right, samples)
        l_labels = [c for c in lhs.columns if c not in {"w_start", "value"}]
        r_labels = [c for c in rhs.columns if c not in {"w_start", "value"}]
        # PromQL drops __name__ before matching — two different metrics
        # with the same labelset DO match (rate(err)/rate(total))
        shared = [c for c in l_labels if c in r_labels and c != "metric"]
        if node.on is None:
            match = shared
        elif node.on[0] == "on":
            match = [c for c in node.on[1] if c in shared]
            if len(match) != len(node.on[1]):
                raise ValueError(
                    f"on(...) labels {node.on[1]} not present on both sides"
                )
        else:  # ignoring
            match = [c for c in shared if c not in node.on[1]]
        keys = [*match, "w_start"]
        if node.op in {"and", "unless"}:
            # PromQL set ops: keep/drop LEFT samples by the existence of
            # a matching labelset in the right vector — semi/anti join,
            # the left vector's values pass through untouched
            how = "left_semi" if node.op == "and" else "left_anti"
            return lhs.join(rhs.select(*keys).distinct(), keys, how).select(
                *lhs.columns  # joins reorder key columns to the front
            )
        if node.op == "or":
            # left samples win; right fills labelsets absent on the left
            if set(l_labels) != set(r_labels):
                raise ValueError(
                    "or requires both vectors to carry the same label "
                    f"columns, got {sorted(l_labels)} vs {sorted(r_labels)}"
                )
            extra = rhs.join(lhs.select(*keys).distinct(), keys, "left_anti")
            return lhs.select(*lhs.columns).unionByName(
                extra.select(*lhs.columns)
            )
        joined = lhs.withColumnRenamed("value", "__l").join(
            rhs.select(*keys, F.col("value").alias("__r")), keys
        )
        lv, rv = F.col("__l"), F.col("__r")
        if node.op in {">", ">=", "<", "<="}:
            pred = {
                ">": lv > rv, ">=": lv >= rv, "<": lv < rv, "<=": lv <= rv,
            }[node.op]
            if node.bool_mode:  # `bool`: 0/1 result, nothing filtered
                return joined.select(
                    *l_labels,
                    "w_start",
                    F.when(pred, 1.0).otherwise(0.0).alias("value"),
                )
            # PromQL filter semantics: keep the LEFT vector's sample
            return joined.filter(pred).select(
                *l_labels, "w_start", lv.alias("value")
            )
        out = {
            "+": lv + rv,
            "-": lv - rv,
            "*": lv * rv,
            "/": lv / F.expr("nullif(__r, 0D)"),
        }[node.op]
        return joined.select(*match, "w_start", out.alias("value"))
    if isinstance(node, BinOp):
        inner = _eval(node.expr, samples)
        v = F.col("value")
        s = F.lit(node.scalar)
        # operand order matters for BOTH families: `100 > m` keeps
        # samples where 100 > value, i.e. value < 100 — not value > 100
        left, right = (s, v) if node.scalar_left else (v, s)
        if node.op in {">", ">=", "<", "<="}:
            pred = {
                ">": left > right,
                ">=": left >= right,
                "<": left < right,
                "<=": left <= right,
            }[node.op]
            if node.bool_mode:  # `bool`: 0/1 result, nothing filtered
                return inner.withColumn(
                    "value", F.when(pred, 1.0).otherwise(0.0)
                )
            return inner.filter(pred)  # comparisons FILTER the vector
        out = {
            "+": left + right,
            "-": left - right,
            "*": left * right,
            "/": left / right,
        }[node.op]
        return inner.withColumn("value", out)
    raise TypeError(f"unknown AST node {node!r}")


def eval_promql(query: str, samples: DataFrame) -> DataFrame:
    """Compile + run ``query`` against ``samples``
    (ts, value, seq, metric, *labels); value rounded to 6dp."""
    out = _eval(parse(query), samples)
    return out.withColumn("value", F.round("value", 6))


# ------------------------------------------------- registry queries

QUERIES: dict = {}

#: bucket width used by the registered query strings (10m).
_W = 600


def _labeled(spark, sf_dir: str) -> DataFrame:
    """events -> labeled sample stream (ts, value, seq, metric, label):
    the same labelset adapter as promql.q_rate_by_labelset (label from
    the props JSON, JVM-side)."""
    from ..io_tables import load_table

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "ts",
        "value",
        F.col("event_id").alias("seq"),
        F.col("event_type").alias("metric"),
        (F.get_json_object(F.col("props"), "$.k").cast("bigint") % 10)
        .cast("bigint")
        .alias("label"),
    )


def q_lang_rate_sum(spark, sf_dir: str) -> DataFrame:
    """A reference-style config string, compiled and run in-engine:
    label-filtered per-series rate, re-aggregated by label."""
    return eval_promql(
        'sum by (label) (rate(click{label=~"[0-3]"}[10m]))',
        _labeled(spark, sf_dir),
    ).select("label", "w_start", F.col("value").alias("rate_sum"))


ORACLE_LANG_RATE_SUM = f"""WITH s AS (
  SELECT event_type AS metric,
         CAST(CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS BIGINT)
           AS label,
         ts, value, event_id AS seq
  FROM events
  WHERE event_type = 'click'
    AND regexp_matches(CAST(CAST(CAST(json_extract(props, '$.k') AS BIGINT)
          % 10 AS BIGINT) AS VARCHAR), '^(?:[0-3])$')
), l AS (
  SELECT metric, label, ts, seq, lag(value) OVER w AS pv, value
  FROM s
  WINDOW w AS (PARTITION BY metric, label ORDER BY ts, seq)
), e AS (
  SELECT metric, label,
         CASE WHEN pv IS NULL THEN NULL
              WHEN value >= pv THEN value - pv
              ELSE value END AS inc,
         time_bucket(INTERVAL '{_W} seconds', ts) AS w_start
  FROM l
), r AS (
  SELECT metric, label, w_start, round(sum(inc) / {_W}.0, 6) AS rate
  FROM e GROUP BY 1, 2, 3
)
SELECT label, w_start, round(sum(rate), 6) AS rate_sum
FROM r GROUP BY 1, 2"""


def q_lang_topk_gauge(spark, sf_dir: str) -> DataFrame:
    """topk over an *_over_time gauge read: the 3 hottest label series
    per bucket by windowed average."""
    return eval_promql(
        "topk(3, avg_over_time(view[10m]))", _labeled(spark, sf_dir)
    ).select("metric", "label", "w_start", F.col("value").alias("avg_v"))


ORACLE_LANG_TOPK_GAUGE = f"""WITH s AS (
  SELECT event_type AS metric,
         CAST(CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS BIGINT)
           AS label,
         time_bucket(INTERVAL '{_W} seconds', ts) AS w_start, value
  FROM events WHERE event_type = 'view'
), a AS (
  SELECT metric, label, w_start, avg(value) AS v FROM s GROUP BY 1, 2, 3
), r AS (
  SELECT *, row_number() OVER (
    PARTITION BY w_start ORDER BY v DESC, metric, label) AS rk
  FROM a
)
SELECT metric, label, w_start, round(v, 6) AS avg_v
FROM r WHERE rk <= 3"""


def q_lang_increase_filter(spark, sf_dir: str) -> DataFrame:
    """Scalar comparison filters the vector (PromQL semantics): buckets
    whose 30m purchase increase exceeds the threshold."""
    from ..io_tables import load_table

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    samples = load_table(spark, sf_dir, "events").select(
        "ts",
        "value",
        F.col("event_id").alias("seq"),
        F.col("event_type").alias("metric"),
    )
    return eval_promql("increase(purchase[30m]) > 50", samples).select(
        "metric", "w_start", F.col("value").alias("increase")
    )


ORACLE_LANG_INCREASE = """WITH l AS (
  SELECT event_type AS metric, ts, event_id AS seq,
         lag(value) OVER w AS pv, value
  FROM events WHERE event_type = 'purchase'
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
), e AS (
  SELECT metric,
         CASE WHEN pv IS NULL THEN NULL
              WHEN value >= pv THEN value - pv
              ELSE value END AS inc,
         time_bucket(INTERVAL '1800 seconds', ts) AS w_start
  FROM l
), r AS (
  SELECT metric, w_start, round(round(sum(inc), 6), 6) AS increase
  FROM e GROUP BY 1, 2
)
SELECT metric, w_start, increase FROM r WHERE increase > 50"""


QUERIES["promql_lang_rate_sum"] = (q_lang_rate_sum, ORACLE_LANG_RATE_SUM)
QUERIES["promql_lang_topk_gauge"] = (q_lang_topk_gauge, ORACLE_LANG_TOPK_GAUGE)
QUERIES["promql_lang_increase_filter"] = (
    q_lang_increase_filter,
    ORACLE_LANG_INCREASE,
)


def q_lang_error_ratio(spark, sf_dir: str) -> DataFrame:
    """THE canonical production PromQL pattern — an error-rate ratio:
    two independently aggregated vectors matched 1:1 on (label,
    bucket), divided (NULL on zero denominators)."""
    return eval_promql(
        "sum by (label) (increase(error[1h]))"
        " / sum by (label) (increase(click[1h]))",
        _labeled(spark, sf_dir),
    ).select("label", "w_start", F.col("value").alias("error_ratio"))


ORACLE_LANG_ERROR_RATIO = f"""WITH s AS (
  SELECT event_type AS metric,
         CAST(CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS BIGINT)
           AS label,
         ts, value, event_id AS seq
  FROM events WHERE event_type IN ('error', 'click')
), l AS (
  SELECT metric, label, ts, seq, lag(value) OVER w AS pv, value
  FROM s
  WINDOW w AS (PARTITION BY metric, label ORDER BY ts, seq)
), e AS (
  SELECT metric, label,
         CASE WHEN pv IS NULL THEN NULL
              WHEN value >= pv THEN value - pv
              ELSE value END AS inc,
         time_bucket(INTERVAL '3600 seconds', ts) AS w_start
  FROM l
), inc AS (
  -- mirror counter_rate exactly: increase = round(SUM(inc), 6) per
  -- (series, bucket); the outer sum-by-label then adds those rounded
  -- per-series values (here one series per label, so it's an identity)
  SELECT metric, label, w_start, round(sum(inc), 6) AS v
  FROM e GROUP BY 1, 2, 3
)
SELECT a.label, a.w_start, round(a.v / nullif(b.v, 0), 6) AS error_ratio
FROM inc a JOIN inc b ON a.label = b.label AND a.w_start = b.w_start
WHERE a.metric = 'error' AND b.metric = 'click'"""


QUERIES["promql_lang_error_ratio"] = (
    q_lang_error_ratio,
    ORACLE_LANG_ERROR_RATIO,
)


def q_lang_histogram_quantile(spark, sf_dir: str) -> DataFrame:
    """histogram_quantile from the string surface: median estimate per
    10m bucket over the error series' synthesized le slots."""
    from ..io_tables import load_table

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    samples = load_table(spark, sf_dir, "events").select(
        "ts",
        "value",
        F.col("event_id").alias("seq"),
        F.col("event_type").alias("metric"),
    )
    return eval_promql("histogram_quantile(0.5, rate(error[10m]))", samples).select(
        "metric", "w_start", F.col("value").alias("p50_est")
    )


def _lang_histq_oracle() -> str:
    from .promql import LE

    q = 0.5
    le_list = "[" + ", ".join(str(v) for v in LE) + "]"
    case = " ".join(f"WHEN value <= {v} THEN {i}" for i, v in enumerate(LE))
    return f"""WITH e AS (
  SELECT event_type AS metric,
         time_bucket(INTERVAL '{_W} seconds', ts) AS w_start,
         CASE {case} ELSE {len(LE)} END AS idx
  FROM events WHERE event_type = 'error'
), c AS (
  SELECT metric, w_start, idx, count(*) AS cnt FROM e GROUP BY 1, 2, 3
), r AS (
  SELECT *,
         sum(cnt) OVER (PARTITION BY metric, w_start ORDER BY idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(cnt) OVER (PARTITION BY metric, w_start) AS total
  FROM c
)
SELECT metric, w_start,
       round(round(CASE WHEN idx >= {len(LE)} THEN {LE[-1]}
             ELSE (CASE WHEN idx = 0 THEN 0.0
                        ELSE ({le_list})[idx] END)
                  + (({le_list})[idx + 1]
                     - CASE WHEN idx = 0 THEN 0.0
                            ELSE ({le_list})[idx] END)
                    * ({q} * total - (cum - cnt)) / cnt
             END, 6), 6) AS p50_est
FROM r
WHERE cum >= {q} * total
QUALIFY row_number() OVER (PARTITION BY metric, w_start ORDER BY idx) = 1"""


QUERIES["promql_lang_histogram_quantile"] = (
    q_lang_histogram_quantile,
    _lang_histq_oracle(),
)


def q_lang_quantile_over_time(spark, sf_dir: str) -> DataFrame:
    """Exact interpolated p95 per (label series, 1h bucket) from the
    string surface — the gauge-latency SLO readout."""
    return eval_promql(
        "quantile_over_time(0.95, view[1h])", _labeled(spark, sf_dir)
    ).select("metric", "label", "w_start", F.col("value").alias("p95_v"))


ORACLE_LANG_QUANTILE_OT = """WITH s AS (
  SELECT event_type AS metric,
         CAST(CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS BIGINT)
           AS label,
         time_bucket(INTERVAL '3600 seconds', ts) AS w_start, value
  FROM events WHERE event_type = 'view'
)
SELECT metric, label, w_start,
       round(quantile_cont(value, 0.95), 6) AS p95_v
FROM s GROUP BY 1, 2, 3"""


QUERIES["promql_lang_quantile_over_time"] = (
    q_lang_quantile_over_time,
    ORACLE_LANG_QUANTILE_OT,
)


def q_lang_label_replace(spark, sf_dir: str) -> DataFrame:
    """Recording-rule relabel from the string surface: bucketize the
    label via regex capture, aggregate on the NEW identity."""
    return eval_promql(
        'sum by (bucket) (label_replace('
        'last_over_time(click[1h]), "bucket", "lo$1", "label", "([0-4])"))',
        _labeled(spark, sf_dir),
    ).select("bucket", "w_start", F.col("value").alias("sum_last"))


ORACLE_LANG_LABEL_REPLACE = """WITH s AS (
  SELECT event_type AS metric,
         CAST(CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS BIGINT)
           AS label,
         time_bucket(INTERVAL '3600 seconds', ts) AS w_start,
         ts, event_id AS seq, value
  FROM events WHERE event_type = 'click'
), last AS (
  SELECT metric, label, w_start, value AS v
  FROM s
  QUALIFY row_number() OVER (PARTITION BY metric, label, w_start
                             ORDER BY ts DESC, seq DESC) = 1
), rl AS (
  -- sum the UNROUNDED last values (the engine rounds once, at the
  -- end) — an inner round would diverge on >6dp sample values
  SELECT CASE WHEN regexp_matches(CAST(label AS VARCHAR), '^(?:([0-4]))$')
              THEN 'lo' || regexp_replace(CAST(label AS VARCHAR),
                                          '^(?:([0-4]))$', '\\1')
              ELSE '' END AS bucket,
         w_start, v
  FROM last
)
SELECT bucket, w_start, round(sum(v), 6) AS sum_last
FROM rl GROUP BY 1, 2"""


QUERIES["promql_lang_label_replace"] = (
    q_lang_label_replace,
    ORACLE_LANG_LABEL_REPLACE,
)


def q_lang_predict_linear(spark, sf_dir: str) -> DataFrame:
    """``predict_linear`` from the string surface: 5-minute-ahead
    linear forecast per (series, label, 10 m bucket), least-squares
    slope anchored at the bucket's last sample — the capacity-planning
    alert idiom (`predict_linear(disk_free[1h], 4*3600) < 0`)."""
    return eval_promql(
        "predict_linear(view[10m], 300)", _labeled(spark, sf_dir)
    ).select(
        "metric", "label", "w_start", F.col("value").alias("predicted")
    )


ORACLE_LANG_PREDICT_LINEAR = """WITH b AS (
  SELECT event_type AS metric,
         CAST(CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS BIGINT)
           AS label,
         ts, value, event_id AS seq,
         time_bucket(INTERVAL '600 seconds', ts) AS w_start,
         epoch(ts) - epoch(time_bucket(INTERVAL '600 seconds', ts)) AS t
  FROM events WHERE event_type = 'view'
), r AS (
  SELECT *, row_number() OVER (
    PARTITION BY metric, label, w_start ORDER BY ts DESC, seq DESC) AS rn
  FROM b
)
SELECT metric, label, w_start,
       round(max(CASE WHEN rn = 1 THEN value END)
             + (covar_pop(value, t) / nullif(var_pop(t), 0))
               * (900.0 - max(CASE WHEN rn = 1 THEN t END)),
             6) AS predicted
FROM r GROUP BY 1, 2, 3"""

QUERIES["promql_lang_predict_linear"] = (
    q_lang_predict_linear,
    ORACLE_LANG_PREDICT_LINEAR,
)


def q_lang_changes_sum(spark, sf_dir: str) -> DataFrame:
    """``changes()`` from the string surface, re-aggregated by label:
    the flappiness readout (how often a gauge changed value per
    bucket).  The lag chain rides the per-(series, label) sample
    order, so a change across a bucket edge still counts — PromQL's
    range-vector semantics."""
    return eval_promql(
        "sum by (label) (changes(click[10m]))", _labeled(spark, sf_dir)
    ).select("label", "w_start", F.col("value").alias("n_changes"))


ORACLE_LANG_CHANGES = """WITH s AS (
  SELECT event_type AS metric,
         CAST(CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS BIGINT)
           AS label,
         ts, value, event_id AS seq
  FROM events WHERE event_type = 'click'
), l AS (
  SELECT *, lag(value) OVER (PARTITION BY metric, label
                             ORDER BY ts, seq) AS pv
  FROM s
)
SELECT label, time_bucket(INTERVAL '600 seconds', ts) AS w_start,
       round(CAST(sum(CASE WHEN pv IS NOT NULL AND value != pv
                           THEN 1 ELSE 0 END) AS DOUBLE), 6) AS n_changes
FROM l GROUP BY 1, 2"""

QUERIES["promql_lang_changes_sum"] = (
    q_lang_changes_sum,
    ORACLE_LANG_CHANGES,
)


def q_lang_unless_gate(spark, sf_dir: str) -> DataFrame:
    """Set-operator alert gating from the string surface: view activity
    UNLESS the same label's click volume ran hot that hour — the
    standard PromQL suppress-when idiom (`alerts unless on (instance)
    maintenance_mode == 1`)."""
    return eval_promql(
        "avg_over_time(view[1h]) unless on (label) "
        "(avg_over_time(click[1h]) > 100)",
        _labeled(spark, sf_dir),
    ).select("metric", "label", "w_start", F.col("value").alias("view_avg"))


ORACLE_LANG_UNLESS_GATE = """WITH s AS (
  SELECT event_type AS metric,
         CAST(CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS BIGINT)
           AS label,
         time_bucket(INTERVAL '3600 seconds', ts) AS w_start, value
  FROM events
), v AS (
  SELECT metric, label, w_start, avg(value) AS view_avg
  FROM s WHERE metric = 'view' GROUP BY 1, 2, 3
), hot AS (
  SELECT label, w_start FROM s WHERE metric = 'click'
  GROUP BY 1, 2 HAVING avg(value) > 100
)
SELECT v.metric, v.label, v.w_start, round(v.view_avg, 6) AS view_avg
FROM v ANTI JOIN hot ON v.label = hot.label AND v.w_start = hot.w_start"""

QUERIES["promql_lang_unless_gate"] = (
    q_lang_unless_gate,
    ORACLE_LANG_UNLESS_GATE,
)
