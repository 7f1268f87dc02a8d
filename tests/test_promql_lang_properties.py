"""Property-based parser pins: render a random valid AST to a PromQL
string, re-parse, and require structural equality — catching
tokenizer/precedence regressions across the whole grammar, not just
the handwritten examples."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from prometheus_anomaly_detection_lstm_spark.operators import promql_lang as L

NAMES = st.sampled_from(["m_total", "click", "http_requests", "a1:b"])
LABELS = st.sampled_from(["label", "job", "instance"])
DURS = st.sampled_from([("30s", 30), ("5m", 300), ("1h", 3600)])
MATCH_OPS = st.sampled_from(["=", "!=", "=~", "!~"])
# regex-safe matcher values (no quotes/backslashes)
VALS = st.text(
    alphabet="abcdef0123456789.*|[]()^$", min_size=1, max_size=8
).filter(lambda s: "()" not in s)


@st.composite
def selectors(draw, with_range=True):
    sel = L.Selector(metric=draw(NAMES))
    for _ in range(draw(st.integers(0, 2))):
        sel.matchers.append(
            (draw(LABELS), draw(MATCH_OPS), draw(VALS))
        )
    if with_range:
        text, secs = draw(DURS)
        sel.range_s = secs
        sel._dur_text = text  # noqa: SLF001 - render hint only
    if draw(st.booleans()):
        otext, osecs = draw(DURS)
        sel.offset_s = osecs
        sel._off_text = otext  # noqa: SLF001
    return sel


@st.composite
def funcs(draw):
    name = draw(
        st.sampled_from(sorted(L.RANGE_FUNCS - {"absent"}))
    )
    return L.Func(name, draw(selectors()))


@st.composite
def aggs(draw):
    op = draw(st.sampled_from(sorted(L.AGG_OPS) + ["quantile"]))
    by = draw(st.lists(LABELS, max_size=2, unique=True))
    without = [] if by else draw(st.lists(LABELS, max_size=1, unique=True))
    phi = round(draw(st.floats(0, 1, allow_nan=False)), 2) if op == "quantile" else None
    return L.Agg(op, by, draw(funcs()), without=without, phi=phi)


@st.composite
def predict_linears(draw):
    return L.PredictLinear(
        float(draw(st.integers(0, 3600))), draw(selectors())
    )


@st.composite
def mathfns(draw):
    name = draw(st.sampled_from(sorted(L.MATH_FUNCS)))
    scalar = None
    if name in {"clamp_min", "clamp_max"}:
        scalar = float(draw(st.integers(-20, 20)))
    elif name == "round":
        scalar = float(draw(st.integers(1, 100))) if draw(st.booleans()) else None
    return L.MathFn(name, draw(funcs()), scalar)


@st.composite
def exprs(draw):
    inner = draw(st.one_of(funcs(), aggs(), predict_linears(), mathfns()))
    if draw(st.booleans()):
        op = draw(st.sampled_from(["+", "-", "*", "/", ">", "<", ">=", "<="]))
        scalar = float(draw(st.integers(0, 99)))
        return L.BinOp(op, inner, scalar, scalar_left=False)
    return inner


def _render_sel(sel: L.Selector) -> str:
    s = sel.metric
    if sel.matchers:
        s += "{" + ",".join(f'{l}{op}"{v}"' for l, op, v in sel.matchers) + "}"
    if sel.range_s is not None:
        s += f"[{getattr(sel, '_dur_text', str(sel.range_s) + 's')}]"
    if sel.offset_s:
        s += f" offset {getattr(sel, '_off_text', str(sel.offset_s) + 's')}"
    return s


def _render(node) -> str:
    if isinstance(node, L.Selector):
        return _render_sel(node)
    if isinstance(node, L.Func):
        return f"{node.name}({_render_sel(node.arg)})"
    if isinstance(node, L.Agg):
        clause = ""
        if node.by:
            clause = f" by ({', '.join(node.by)}) "
        elif node.without:
            clause = f" without ({', '.join(node.without)}) "
        if node.op == "quantile":
            return f"{node.op}{clause}({node.phi:g}, {_render(node.arg)})"
        return f"{node.op}{clause}({_render(node.arg)})"
    if isinstance(node, L.PredictLinear):
        return f"predict_linear({_render_sel(node.sel)}, {node.horizon_s:g})"
    if isinstance(node, L.MathFn):
        if node.scalar is not None:
            return f"{node.name}({_render(node.arg)}, {node.scalar:g})"
        return f"{node.name}({_render(node.arg)})"
    if isinstance(node, L.BinOp):
        body = _render(node.expr)
        if node.scalar_left:
            return f"{node.scalar:g} {node.op} {body}"
        return f"{body} {node.op} {node.scalar:g}"
    raise TypeError(node)


@given(exprs())
@settings(max_examples=200, deadline=None)
def test_parse_render_roundtrip(ast):
    # the _dur_text/_off_text render hints live in __dict__, not in
    # the dataclass fields, so generated __eq__ ignores them
    rendered = _render(ast)
    reparsed = L.parse(rendered)
    assert reparsed == ast, rendered


@given(st.text(max_size=40))
@settings(max_examples=300, deadline=None)
def test_parser_never_crashes_unexpectedly(garbage):
    """Arbitrary input either parses or raises ValueError — no other
    exception type escapes the parser."""
    try:
        L.parse(garbage)
    except ValueError:
        pass


@st.composite
def lowerable_exprs(draw):
    """ASTs restricted to the labels that exist on the test samples
    frame, so lowering must always succeed."""
    sel = L.Selector(metric=draw(st.sampled_from(["click", "view", "error"])))
    text, secs = draw(DURS)
    sel.range_s = secs
    node = L.Func(
        draw(st.sampled_from(sorted(L.RANGE_FUNCS - {"absent"}))), sel
    )
    shape = draw(st.integers(0, 3))
    if shape == 1:
        node = L.Agg(
            draw(st.sampled_from(sorted(L.AGG_OPS))),
            draw(st.sampled_from([[], ["label"], ["metric", "label"]])),
            node,
        )
    elif shape == 2:
        node = L.MathFn(
            draw(st.sampled_from(sorted(L.MATH_FUNCS))),
            node,
            scalar=draw(st.floats(-10, 10)),
        )
    elif shape == 3:
        node = L.BinOp(
            draw(st.sampled_from(["+", "-", "*", "/", ">", "<"])),
            node,
            float(draw(st.integers(-50, 50))),
            scalar_left=draw(st.booleans()),
        )
    return node


@given(lowerable_exprs())
@settings(max_examples=60, deadline=None)
def test_lowering_constructs_valid_plans(spark, ast):
    """Every grammar shape lowers to an analyzable DataFrame with the
    (.., w_start, value) contract — construction only, no job run.
    (conftest's spark fixture is session-scoped, which hypothesis
    permits under @given — only function-scoped fixtures are barred.)"""
    samples = spark.createDataFrame(
        [], "ts timestamp, value double, seq long, metric string, label long"
    )
    df = L._eval(ast, samples)
    assert "w_start" in df.columns and "value" in df.columns
    df.schema  # forces analysis
