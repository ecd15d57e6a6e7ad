"""Direct port of the reference's imperative-language test corpus
(crates/varpulis-runtime/tests/imperative_tests.rs, 16 cases): for/while
loops with break/continue, if/elif/else chains and nesting, return
(value / early-exit / void), iterative fibonacci, and conditional emits —
each program text taken verbatim from the Rust test and run through the
Spark `.process` path, asserting the reference's expected values."""

import pytest

from varpulis_spark.sources.event_file import load_evt
from varpulis_spark.stream import Stream
from varpulis_spark.vpl.compiler import run_program


@pytest.fixture(scope="module")
def spark():
    from varpulis_spark.engine import get_spark

    return get_spark("imperative-port-tests")


def run(spark, code: str) -> list:
    """One Trigger event through stream S; rows in emit order."""
    stream = Stream(load_evt(spark, "Trigger { }\n"), ts_col="ts",
                    order_col="event_id")
    return run_program(code, stream)["S"].collect()


def test_for_loop_range(spark):
    rows = run(spark, """
fn gen():
    for i in 0..5:
        emit R(val: i)

stream S = Trigger
    .process(gen())
""")
    assert [r.val for r in rows] == [0, 1, 2, 3, 4]


def test_for_loop_accumulator(spark):
    rows = run(spark, """
fn gen():
    var sum = 0
    for i in 1..=4:
        sum := sum + i
    emit R(total: sum)

stream S = Trigger
    .process(gen())
""")
    assert [r.total for r in rows] == [10]


def test_for_loop_break(spark):
    rows = run(spark, """
fn gen():
    for i in 0..10:
        if i == 3:
            break
        emit R(val: i)

stream S = Trigger
    .process(gen())
""")
    assert [r.val for r in rows] == [0, 1, 2]


def test_for_loop_continue(spark):
    rows = run(spark, """
fn gen():
    for i in 0..6:
        if i % 2 == 0:
            continue
        emit R(val: i)

stream S = Trigger
    .process(gen())
""")
    assert [r.val for r in rows] == [1, 3, 5]


def test_nested_for_loops(spark):
    rows = run(spark, """
fn gen():
    for row in 0..3:
        for col in 0..3:
            emit R(row: row, col: col)

stream S = Trigger
    .process(gen())
""")
    results = [(r.row, r.col) for r in rows]
    assert len(results) == 9
    assert results[0] == (0, 0) and results[4] == (1, 1) and results[8] == (2, 2)


def test_while_loop_basic(spark):
    rows = run(spark, """
fn gen():
    var i = 0
    while i < 5:
        emit R(val: i)
        i := i + 1

stream S = Trigger
    .process(gen())
""")
    assert [r.val for r in rows] == [0, 1, 2, 3, 4]


def test_while_loop_break(spark):
    rows = run(spark, """
fn gen():
    var sum = 0
    var i = 1
    while i < 100:
        sum := sum + i
        if sum > 10:
            break
        i := i + 1
    emit R(sum: sum, i: i)

stream S = Trigger
    .process(gen())
""")
    (r,) = rows
    assert r.sum > 10
    # 1+2+3+4+5 = 15 is the first prefix sum > 10, reached at i=5
    assert r.sum == 15 and r.i == 5


def test_while_loop_continue(spark):
    rows = run(spark, """
fn gen():
    var i = 0
    while i < 10:
        i := i + 1
        if i % 3 == 0:
            continue
        emit R(val: i)

stream S = Trigger
    .process(gen())
""")
    assert [r.val for r in rows] == [1, 2, 4, 5, 7, 8, 10]


def test_if_basic(spark):
    rows = run(spark, """
fn classify(n: int):
    if n > 0:
        emit R(label: "positive")
    else:
        emit R(label: "non_positive")

fn gen():
    classify(5)
    classify(-3)

stream S = Trigger
    .process(gen())
""")
    assert [r.label for r in rows] == ["positive", "non_positive"]


def test_if_elif_else_chain(spark):
    rows = run(spark, """
fn classify(n: int):
    if n > 100:
        emit R(bucket: "high")
    elif n > 50:
        emit R(bucket: "mid")
    else:
        emit R(bucket: "low")

fn gen():
    classify(150)
    classify(75)
    classify(10)

stream S = Trigger
    .process(gen())
""")
    assert [r.bucket for r in rows] == ["high", "mid", "low"]


def test_if_nested(spark):
    rows = run(spark, """
fn classify(x: int, y: int):
    if x > 0:
        if y > 0:
            emit R(quadrant: "I")
        else:
            emit R(quadrant: "IV")
    else:
        if y > 0:
            emit R(quadrant: "II")
        else:
            emit R(quadrant: "III")

fn gen():
    classify(1, 1)
    classify(-1, 1)
    classify(-1, -1)
    classify(1, -1)

stream S = Trigger
    .process(gen())
""")
    assert [r.quadrant for r in rows] == ["I", "II", "III", "IV"]


def test_return_value(spark):
    rows = run(spark, """
fn square(n: int) -> int:
    return n * n

fn gen():
    let result = square(7)
    emit R(val: result)

stream S = Trigger
    .process(gen())
""")
    assert [r.val for r in rows] == [49]


def test_return_early_exit(spark):
    rows = run(spark, """
fn first_positive(a: int, b: int, c: int) -> int:
    if a > 0:
        return a
    if b > 0:
        return b
    if c > 0:
        return c
    return -1

fn gen():
    let r = first_positive(-5, 3, 7)
    emit R(val: r)

stream S = Trigger
    .process(gen())
""")
    assert [r.val for r in rows] == [3]


def test_return_void(spark):
    rows = run(spark, """
fn maybe_emit(n: int):
    if n < 0:
        return
    emit R(val: n)

fn gen():
    maybe_emit(-1)
    maybe_emit(42)

stream S = Trigger
    .process(gen())
""")
    assert [r.val for r in rows] == [42]


def test_fibonacci_iterative(spark):
    rows = run(spark, """
fn fib(n: int) -> int:
    var a = 0
    var b = 1
    var i = 0
    while i < n:
        let tmp = b
        b := a + b
        a := tmp
        i := i + 1
    return a

fn gen():
    let result = fib(10)
    emit R(val: result)

stream S = Trigger
    .process(gen())
""")
    assert [r.val for r in rows] == [55]


def test_loop_with_conditional_emit(spark):
    rows = run(spark, """
fn gen():
    for i in 0..10:
        if i % 2 == 0:
            emit Even(val: i)
        else:
            emit Odd(val: i)

stream S = Trigger
    .process(gen())
""")
    assert len(rows) == 10
    assert sorted(r.val for r in rows if r.event_type == "Even") == [0, 2, 4, 6, 8]
    assert sorted(r.val for r in rows if r.event_type == "Odd") == [1, 3, 5, 7, 9]
