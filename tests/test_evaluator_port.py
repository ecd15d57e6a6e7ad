"""Port of the reference's expression-evaluator battery
(crates/varpulis-runtime/tests/evaluator_coverage_tests.rs): control
flow, string/math/array/map builtins, user fns, operators — each VPL
program verbatim, driven through `.process(gen())` by one Trigger event,
assertions on the emitted event's fields."""

import math

import pytest

from varpulis_spark.sources.event_file import load_evt
from varpulis_spark.stream import Stream
from varpulis_spark.vpl.compiler import run_program


@pytest.fixture(scope="module")
def spark():
    from varpulis_spark.engine import get_spark

    return get_spark("evaluator-port-tests")


def one(spark, body: str, stream_name: str = "S") -> dict:
    """Run `fn gen(): ...` + `stream S = Trigger .process(gen())` with one
    Trigger event; return the single emitted event's fields (or the list
    when the caller expects several)."""
    res = run_program(
        body,
        Stream(load_evt(spark, "Trigger { x: 1 }\n"), ts_col="ts",
               order_col="event_id"),
    )
    names = [n for n in res if n != stream_name] or [stream_name]
    rows = []
    for n in names:
        rows.extend(r.asDict() for r in res[n].collect())
    return rows


PROG = """
fn gen():
{body}

stream S = Trigger
    .process(gen())
"""


def gen(body: str) -> str:
    indented = "\n".join("    " + line for line in body.strip().splitlines())
    return PROG.format(body=indented)


# -- control flow (rs:32-99, 563, 629-676, 956) ---------------------------------


def test_for_loop_with_break(spark):
    (r,) = one(spark, gen("""
var result = 0
for i in 0..10:
    if i == 3:
        break
    result := result + 1
emit R(count: result)
"""))
    assert r["count"] == 3


def test_for_loop_with_continue(spark):
    (r,) = one(spark, gen("""
var total = 0
for i in 0..6:
    if i % 2 == 0:
        continue
    total := total + i
emit R(val: total)
"""))
    assert r["val"] == 9


def test_while_loop_with_return(spark):
    (r,) = one(spark, """
fn find_first_over(threshold: int) -> int:
    var i = 0
    while i < 100:
        if i > threshold:
            return i
        i := i + 1
    return -1

fn gen():
    emit R(val: find_first_over(42))

stream S = Trigger
    .process(gen())
""")
    assert r["val"] == 43


def test_range_inclusive_iteration(spark):
    (r,) = one(spark, gen("""
var total = 0
for i in 1..=5:
    total := total + i
emit R(val: total)
"""))
    assert r["val"] == 15


def test_if_elif_else(spark):
    (r,) = one(spark, """
fn classify(x: int) -> str:
    if x > 100:
        return "high"
    elif x > 50:
        return "medium"
    else:
        return "low"

fn gen():
    emit R(a: classify(150), b: classify(75), c: classify(10))

stream S = Trigger
    .process(gen())
""")
    assert (r["a"], r["b"], r["c"]) == ("high", "medium", "low")


def test_for_loop_over_array(spark):
    (r,) = one(spark, gen("""
let items = [10, 20, 30]
var total = 0
for item in items:
    total := total + item
emit R(val: total)
"""))
    assert r["val"] == 60


def test_nested_for_loops(spark):
    (r,) = one(spark, gen("""
var count = 0
for i in 0..3:
    for j in 0..3:
        count := count + 1
emit R(val: count)
"""))
    assert r["val"] == 9


def test_emit_inside_for_loop(spark):
    rows = one(spark, gen("""
for i in 0..3:
    emit Item(idx: i)
"""))
    assert sorted(r["idx"] for r in rows) == [0, 1, 2]


# -- string builtins (rs:101-197, 683, 773, 854) ---------------------------------


def test_string_split_and_join(spark):
    (r,) = one(spark, gen("""
let arr = split("a,b,c", ",")
emit R(parts: arr, n: len(arr))
"""))
    assert list(r["parts"]) == ["a", "b", "c"] and r["n"] == 3


def test_string_contains_and_replace(spark):
    (r,) = one(spark, gen("""
emit R(
    has: contains("hello world", "world"),
    replaced: replace("foobar", "foo", "baz")
)
"""))
    assert r["has"] is True and r["replaced"] == "bazbar"


def test_string_case_and_trim(spark):
    (r,) = one(spark, gen("""
emit R(up: upper("hello"), lo: lower("WORLD"), trimmed: trim("  hi  "))
"""))
    assert (r["up"], r["lo"], r["trimmed"]) == ("HELLO", "world", "hi")


def test_string_starts_ends_with(spark):
    (r,) = one(spark, gen("""
emit R(sw: starts_with("foobar", "foo"), ew: ends_with("foobar", "baz"))
"""))
    assert r["sw"] is True and r["ew"] is False


def test_string_substring(spark):
    (r,) = one(spark, gen('emit R(sub: substring("hello world", 6, 11))'))
    assert r["sub"] == "world"


def test_string_substring_two_arg_defaults_end(spark):
    # end defaults to s.len() (evaluator.rs:745-748)
    (r,) = one(spark, gen('emit R(sub: substring("hello world", 6))'))
    assert r["sub"] == "world"


def test_string_substring_out_of_range_is_null(spark):
    # start > end or end > len → None, not a clamped slice (rs:752-754)
    (r,) = one(spark, gen(
        'emit R(a: substring("abc", 2, 1) ?? "N", '
        'b: substring("abc", 0, 9) ?? "N", '
        'c: substring("abc", -1, 2) ?? "N")'
    ))
    assert r["a"] == "N" and r["b"] == "N" and r["c"] == "N"


def test_string_length(spark):
    (r,) = one(spark, gen('emit R(l: len("hello"))'))
    assert r["l"] == 5


def test_string_concatenation(spark):
    (r,) = one(spark, gen('emit R(val: "hello" + " " + "world")'))
    assert r["val"] == "hello world"


def test_reverse_string(spark):
    (r,) = one(spark, gen('emit R(val: reverse("hello"))'))
    assert r["val"] == "olleh"


# -- math builtins (rs:204-299) ----------------------------------------------------


def test_math_sqrt_pow_abs(spark):
    (r,) = one(spark, gen(
        "emit R(sq: sqrt(16.0), pw: pow(2.0, 10.0), ab: abs(-42))"
    ))
    assert r["sq"] == 4.0 and r["pw"] == 1024.0 and r["ab"] == 42


def test_math_ceil_floor_round(spark):
    (r,) = one(spark, gen("emit R(c: ceil(3.2), f: floor(3.8), r: round(3.5))"))
    assert (r["c"], r["f"], r["r"]) == (4, 3, 4)


def test_math_log_exp(spark):
    (r,) = one(spark, gen("emit R(ln: log(1.0), ex: exp(0.0), l10: log10(100.0))"))
    assert (r["ln"], r["ex"], r["l10"]) == (0.0, 1.0, 2.0)


def test_math_sin_cos_tan(spark):
    (r,) = one(spark, gen("emit R(s: sin(0.0), c: cos(0.0), t: tan(0.0))"))
    assert (r["s"], r["c"], r["t"]) == (0.0, 1.0, 0.0)


def test_math_min_max(spark):
    (r,) = one(spark, gen("emit R(mn: min(3, 7), mx: max(3.5, 2.1))"))
    assert r["mn"] == 3 and r["mx"] == 3.5


# -- array operations (rs:306-399, 809-931) ------------------------------------------


def test_array_reverse_first_last(spark):
    (r,) = one(spark, gen("""
let arr = [10, 20, 30]
emit R(rev: reverse(arr), fst: first(arr), lst: last(arr))
"""))
    assert list(r["rev"]) == [30, 20, 10]
    assert r["fst"] == 10 and r["lst"] == 30


def test_array_push_and_length(spark):
    (r,) = one(spark, gen("""
let arr = [1, 2]
let arr2 = push(arr, 3)
emit R(l: len(arr2))
"""))
    assert r["l"] == 3


def test_array_sort(spark):
    (r,) = one(spark, gen("""
let arr = [3, 1, 4, 1, 5, 9, 2, 6]
emit R(sorted: sort(arr))
"""))
    assert list(r["sorted"]) == [1, 1, 2, 3, 4, 5, 6, 9]


def test_array_sum_avg(spark):
    (r,) = one(spark, gen("""
let arr = [10, 20, 30]
emit R(s: sum(arr), a: avg(arr))
"""))
    assert float(r["s"]) == 60.0 and float(r["a"]) == 20.0


def test_array_pop(spark):
    (r,) = one(spark, gen("""
let arr = [1, 2, 3]
let popped = pop(arr)
emit R(l: len(popped))
"""))
    assert r["l"] == 2


def test_array_contains(spark):
    (r,) = one(spark, gen("""
let arr = ["a", "b", "c"]
emit R(has_b: contains(arr, "b"), has_z: contains(arr, "z"))
"""))
    assert r["has_b"] is True and r["has_z"] is False


def test_array_get_and_set(spark):
    (r,) = one(spark, gen("""
let arr = [1, 2, 3]
let arr2 = set(arr, 1, 99)
emit R(got: get(arr, 0), modified: get(arr2, 1))
"""))
    assert r["got"] == 1 and r["modified"] == 99


def test_array_negative_indexing(spark):
    (r,) = one(spark, gen("""
let arr = [10, 20, 30, 40]
emit R(last: arr[-1], second_last: arr[-2])
"""))
    assert r["last"] == 40 and r["second_last"] == 30


def test_range_builtin_function(spark):
    (r,) = one(spark, gen("""
let r = range(5)
emit R(l: len(r), fst: first(r), lst: last(r))
"""))
    assert (r["l"], r["fst"], r["lst"]) == (5, 0, 4)


# -- user functions (rs:406-447) -------------------------------------------------------


def test_user_function_with_params(spark):
    (r,) = one(spark, """
fn add(a: int, b: int) -> int:
    return a + b

fn double(x: int) -> int:
    return x * 2

fn gen():
    emit R(val: add(double(3), 4))

stream S = Trigger
    .process(gen())
""")
    assert r["val"] == 10


def test_nested_function_calls(spark):
    (r,) = one(spark, """
fn square(x: int) -> int:
    return x * x

fn hypotenuse(a: int, b: int) -> float:
    return sqrt(to_float(square(a) + square(b)))

fn gen():
    emit R(val: hypotenuse(3, 4))

stream S = Trigger
    .process(gen())
""")
    assert abs(r["val"] - 5.0) < 0.001


# -- type checks and conversion (rs:455-508) ---------------------------------------------


def test_type_checking_builtins(spark):
    (r,) = one(spark, gen("""
emit R(
    t1: type_of(42),
    t2: type_of("hello"),
    t3: type_of(3.14),
    t4: type_of(true),
    n: is_null(null),
    i: is_int(42),
    f: is_float(3.14),
    s: is_string("hi"),
    b: is_bool(false)
)
"""))
    assert (r["t1"], r["t2"], r["t3"], r["t4"]) == ("int", "string", "float", "bool")
    assert all(r[k] is True for k in ("n", "i", "f", "s", "b"))


def test_conversion_builtins(spark):
    (r,) = one(spark, gen("""
emit R(s: to_string(42), i: to_int("123"), f: to_float("2.72"))
"""))
    assert r["s"] == "42" and r["i"] == 123 and abs(r["f"] - 2.72) < 0.001


def test_is_array_is_map_type_checks(spark):
    (r,) = one(spark, gen("""
let arr = [1, 2]
let m = { "a": 1 }
emit R(ia: is_array(arr), im: is_map(m), ia2: is_array(42), im2: is_map("str"))
"""))
    assert r["ia"] is True and r["im"] is True
    assert r["ia2"] is False and r["im2"] is False


# -- maps (rs:515-533, map_get_by_key) ----------------------------------------------------


def test_map_keys_values_len(spark):
    (r,) = one(spark, gen("""
let m = { "a": 1, "b": 2, "c": 3 }
emit R(k: len(keys(m)), v: len(values(m)), sz: len(m))
"""))
    assert (r["k"], r["v"], r["sz"]) == (3, 3, 3)


def test_map_get_by_key(spark):
    (r,) = one(spark, gen("""
let m = { "x": 10, "y": 20 }
emit R(x: get(m, "x"), y: get(m, "y"))
"""))
    assert r["x"] == 10 and r["y"] == 20


# -- operators (rs:540-556, 701-745, 791-802, 938-949, 978-1231) ----------------------------


def test_division_by_zero_returns_null(spark):
    (r,) = one(spark, gen("emit R(val: 10 / 0, ok: 1)"))
    assert r["val"] is None and r["ok"] == 1


def test_boolean_logic_operators(spark):
    (r,) = one(spark, gen("""
emit R(a: true and false, o: true or false, n: 5 > 3 and 10 < 20)
"""))
    assert r["a"] is False and r["o"] is True and r["n"] is True


def test_mixed_type_arithmetic(spark):
    (r,) = one(spark, gen("emit R(val: 3 + 2.5, mul: 2 * 3.0, sub: 10.0 - 3)"))
    assert abs(r["val"] - 5.5) < 0.001 and abs(r["mul"] - 6.0) < 0.001
    assert abs(r["sub"] - 7.0) < 0.001


def test_modulo_operator(spark):
    (r,) = one(spark, gen("emit R(val: 17 % 5)"))
    assert r["val"] == 2


def test_modulo_float_mixes(spark):
    (r,) = one(spark, gen("emit R(a: 10.5 % 3, b: 10 % 3.0)"))
    assert abs(r["a"] - 1.5) < 0.001 and abs(r["b"] - 1.0) < 0.001


def test_unary_negation(spark):
    (r,) = one(spark, gen("emit R(ni: -42, nf: -2.72)"))
    assert r["ni"] == -42 and abs(r["nf"] + 2.72) < 0.001


def test_power_operator_int_int(spark):
    (r,) = one(spark, gen("emit R(val: 2 ** 10)"))
    assert r["val"] == 1024


def test_power_operator_float_int(spark):
    (r,) = one(spark, gen("emit R(val: 2.5 ** 3)"))
    assert abs(r["val"] - 15.625) < 0.001


def test_power_operator_int_float(spark):
    (r,) = one(spark, gen("emit R(val: 4 ** 0.5)"))
    assert abs(r["val"] - 2.0) < 0.001


def test_in_not_in_operators(spark):
    (r,) = one(spark, gen("""
let arr = [1, 2, 3]
emit R(yes: 2 in arr, no: not (5 in arr))
"""))
    assert r["yes"] is True and r["no"] is True


def test_in_operator_on_string(spark):
    (r,) = one(spark, gen("""
emit R(yes: "world" in "hello world", no: "xyz" in "hello world")
"""))
    assert r["yes"] is True and r["no"] is False


def test_ternary_if_expression(spark):
    (r,) = one(spark, gen('emit R(val: if true then "yes" else "no")'))
    assert r["val"] == "yes"


def test_coalesce_via_is_null(spark):
    (r,) = one(spark, gen("""
var val = null
if is_null(val):
    val := "default"
emit R(val: val)
"""))
    assert r["val"] == "default"
