"""ops/sqlfn.py: the lambdafunction -> arrow rewriter must stay
correct on every string-literal escape style Spark's .sql() can emit
(backslash-escaped quotes — the observed pyspark 4.1.2 form — and the
doubled-quote style, defensively), because a mis-tracked literal that
happens to contain parens or commas would corrupt the registered
function body."""

from __future__ import annotations

from route81_spark.ops.sqlfn import lambda_arrows


def test_plain_rewrite():
    assert (
        lambda_arrows("transform(a, lambdafunction(f(x_1), x_1))")
        == "transform(a, (x_1 -> f(x_1)))"
    )


def test_backslash_escaped_quotes_with_parens_and_commas_inside():
    # the literal '\'(' contains an escaped quote followed by a paren;
    # a scanner that mishandles \' would leave the quote region open
    # and misparse the body
    src = "transform(a, lambdafunction(concat('\\'(', x_1, '),\\''), x_1))"
    want = "transform(a, (x_1 -> concat('\\'(', x_1, '),\\'')))"
    assert lambda_arrows(src) == want


def test_doubled_quote_style_still_handled():
    src = "transform(a, lambdafunction(concat('it''s, (', x_1), x_1))"
    want = "transform(a, (x_1 -> concat('it''s, (', x_1)))"
    assert lambda_arrows(src) == want


def test_nested_lambdas_rewrite_inside_out():
    src = (
        "transform(a, lambdafunction("
        "get(transform(array(x_1), lambdafunction(g(x_2), x_2)), 0), x_1))"
    )
    out = lambda_arrows(src)
    assert "lambdafunction" not in out
    assert out == (
        "transform(a, (x_1 -> "
        "get(transform(array(x_1), (x_2 -> g(x_2))), 0)))"
    )


def test_multi_arg_lambda():
    src = "aggregate(a, 0, lambdafunction(h(x_1, x_2), x_1, x_2))"
    assert (
        lambda_arrows(src)
        == "aggregate(a, 0, ((x_1, x_2) -> h(x_1, x_2)))"
    )
