"""Port of the reference's semantic-validation battery
(crates/varpulis-runtime/tests/validation_coverage_tests.rs → the
varpulis-core/src/validate pass), run against vpl/validate.py.

Divergences (documented in vpl/validate.py): `.distinct/.limit/
.order_by/.first` are E090 "not yet implemented" in the reference but
fully implemented here, so those two E090 tests assert NO diagnostic
instead; E005/E007/E031 (contexts, type aliases) are not applicable.
"""

import pytest

from varpulis_spark.vpl.parser import parse_full
from varpulis_spark.vpl.validate import validate


def diags(code: str):
    return validate(parse_full(code))


def has_error(v, code):
    return any(d.severity == "error" and d.code == code for d in v.diagnostics)


def has_warning(v, code):
    return any(d.severity == "warning" and d.code == code for d in v.diagnostics)


def no_errors(v):
    return not v.errors


# -- duplicate declarations (rs:41-77, 504) -----------------------------------


def test_duplicate_event_declaration():
    v = diags("event Foo:\n    x: int\nevent Foo:\n    y: float")
    assert has_error(v, "E001"), v.format()


def test_duplicate_stream_declaration():
    v = diags("stream S = A\nstream S = B\n")
    assert has_error(v, "E002"), v.format()


def test_duplicate_function_declaration():
    v = diags("fn f() -> int:\n    return 1\nfn f() -> int:\n    return 2\n")
    assert has_error(v, "E003"), v.format()


def test_duplicate_connector_declaration():
    v = diags('connector C = mqtt(topic: "a")\nconnector C = kafka(topic: "b")\n')
    assert has_error(v, "E004"), v.format()


# -- op ordering (rs:84-148, 484) ---------------------------------------------


def test_having_without_aggregate():
    v = diags("stream S = A\n    .having(cnt > 0)\n")
    assert has_error(v, "E010"), v.format()


def test_duplicate_aggregate():
    v = diags(
        "stream S = A\n    .window(5)\n    .aggregate(c: count())\n"
        "    .aggregate(s: sum(value))\n"
    )
    assert has_error(v, "E011"), v.format()


def test_duplicate_window():
    v = diags("stream S = A\n    .window(5)\n    .window(10)\n")
    assert has_error(v, "E012"), v.format()


def test_within_outside_sequence():
    v = diags("stream S = A\n    .within(5s)\n")
    assert has_error(v, "E020"), v.format()


def test_ops_before_inline_pattern():
    # ours (E091): the lowering would silently drop ops preceding
    # .pattern(...) — must be a hard diagnostic instead
    v = diags(
        "stream S = E\n    .where(x > 1)\n    .pattern(chain: A -> B)\n"
    )
    assert has_error(v, "E091"), v.format()


def test_inline_pattern_first_op_is_clean():
    v = diags("stream S = E\n    .pattern(chain: A -> B)\n")
    assert not any(d.code == "E091" for d in v.errors), v.format()


def test_aggregate_without_window_warning():
    v = diags("stream S = A\n    .aggregate(c: count())\n")
    assert has_warning(v, "W001"), v.format()


def test_partition_after_window_warning():
    v = diags("stream S = A\n    .window(5)\n    .partition_by(region)\n")
    assert has_warning(v, "W002"), v.format()


def test_valid_stream_with_partition_before_window():
    v = diags(
        "stream S = A\n    .partition_by(region)\n    .window(5)\n"
        "    .aggregate(c: count())\n"
    )
    assert not has_warning(v, "W002"), v.format()


# -- variables (rs:155-167) ---------------------------------------------------


def test_assignment_to_immutable():
    v = diags("let x = 1\nx := 2\n")
    assert has_error(v, "E040"), v.format()


def test_valid_mutable_variable():
    v = diags("var x = 1\nx := 2\n")
    assert no_errors(v), v.format()


def test_implicit_assignment_creates_mutable():
    v = diags("new_var := 42\nnew_var := 43\n")
    assert no_errors(v), v.format()


# -- functions (rs:174, 458) --------------------------------------------------


def test_unknown_function_call():
    v = diags("let x = nonexistent_func(1)")
    assert has_error(v, "E050"), v.format()


def test_function_arity_mismatch():
    v = diags("fn add(a: int, b: int):\n    return a + b\nlet x = add(1)")
    assert has_error(v, "E051"), v.format()


def test_valid_function_declaration():
    v = diags("fn add(a: int, b: int):\n    return a + b\n")
    assert no_errors(v), v.format()


# -- expression type checks (rs:184-219, 623-658) -------------------------------


def test_where_non_boolean_literal():
    v = diags("stream S = A\n    .where(42)\n")
    assert has_error(v, "E060"), v.format()


def test_where_string_literal():
    v = diags('stream S = A\n    .where("hello")\n')
    assert has_error(v, "E060"), v.format()


def test_where_with_float_literal():
    v = diags("stream S = A\n    .where(3.14)\n")
    assert has_error(v, "E060"), v.format()


def test_where_with_boolean_literal_true():
    v = diags("stream S = A\n    .where(true)\n")
    assert no_errors(v), v.format()


def test_arithmetic_in_where_warning():
    v = diags("stream S = A\n    .where(x + 1)\n")
    assert has_warning(v, "W060"), v.format()


def test_within_non_duration():
    v = diags(
        "event A:\n    x: int\nevent B:\n    x: int\n"
        "stream S = A as a\n    -> B as b\n    .within(3.14)"
    )
    assert has_error(v, "E061"), v.format()


def test_within_with_string_literal():
    v = diags(
        "event A:\n    x: int\nevent B:\n    y: int\n"
        'stream S = A as a\n    -> B as b\n    .within("bad")'
    )
    assert has_error(v, "E061"), v.format()


def test_within_with_bool_literal():
    v = diags(
        "event A:\n    x: int\nevent B:\n    y: int\n"
        "stream S = A as a\n    -> B as b\n    .within(true)"
    )
    assert has_error(v, "E061"), v.format()


def test_valid_sequence_with_within():
    v = diags(
        "event A:\n    x: int\nevent B:\n    y: int\n"
        "stream S = A as a\n    -> B as b\n    .within(5s)"
    )
    assert no_errors(v), v.format()


# -- aggregate function checks (rs:226-267, 468) --------------------------------


def test_unknown_aggregate_function():
    v = diags("stream S = A\n    .window(5)\n    .aggregate(x: bogus_agg(value))\n")
    assert has_error(v, "E070"), v.format()


def test_aggregate_missing_field_arg():
    v = diags("stream S = A\n    .window(5)\n    .aggregate(s: sum())\n")
    assert has_error(v, "E071"), v.format()


def test_ema_missing_arguments():
    v = diags("stream S = A\n    .window(5)\n    .aggregate(e: ema())\n")
    assert has_error(v, "E072"), v.format()


def test_bare_field_in_aggregate():
    v = diags("stream S = A\n    .window(5)\n    .aggregate(v: value)\n")
    assert has_error(v, "E073"), v.format()


def test_count_takes_no_field_arg():
    v = diags("stream S = A\n    .window(5)\n    .aggregate(c: count())\n")
    assert no_errors(v), v.format()


def test_valid_aggregate_with_window():
    v = diags(
        "stream S = Reading\n    .window(5)\n"
        "    .aggregate(c: count(), s: sum(value), a: avg(value))\n"
    )
    assert no_errors(v), v.format()


# -- connector references (rs:418-451) ------------------------------------------


def test_undefined_connector_in_to():
    v = diags('stream S = A\n    .to(UndefinedConnector, topic: "test")\n')
    assert has_error(v, "E030"), v.format()


def test_valid_connector_reference():
    v = diags(
        'connector MyMqtt = mqtt(topic: "test")\n'
        'stream S = A\n    .to(MyMqtt, topic: "output")\n'
    )
    assert not has_error(v, "E030"), v.format()


def test_enrich_incompatible_connector():
    v = diags(
        'connector M = mqtt(topic: "t")\n'
        "stream S = A\n    .enrich(M, key: user_id, fields: [a])\n"
    )
    assert has_error(v, "E032"), v.format()


def test_enrich_compatible_connector_and_no_fields_warns():
    v = diags(
        'connector H = http(url: "http://x")\n'
        "stream S = A\n    .enrich(H, key: user_id)\n"
    )
    assert not has_error(v, "E032"), v.format()
    assert has_warning(v, "W032"), v.format()


# -- undeclared sources / emit types (rs:398, W031) ------------------------------


def test_undeclared_event_type_warning():
    v = diags("stream S = NonExistentEvent\n    .where(value > 0)\n")
    assert has_warning(v, "W030"), v.format()


def test_emit_as_undeclared_type_warns():
    v = diags("stream S = A\n    .emit(Alert, x: 1)\n")
    assert has_warning(v, "W031"), v.format()


# -- unimplemented ops (rs:568-595; divergence: distinct/limit work here) --------


def test_map_reports_e090():
    v = diags("stream S = A\n    .map(x)\n")
    assert has_error(v, "E090"), v.format()


def test_distinct_and_limit_are_implemented_here():
    # E090 in the reference validator; fully implemented extensions here
    v = diags("stream S = A\n    .distinct()\n")
    assert not has_error(v, "E090"), v.format()
    v = diags("stream S = A\n    .limit(100)\n")
    assert not has_error(v, "E090"), v.format()


# -- valid programs (rs:312-373, 598-619) ----------------------------------------


def test_valid_simple_stream():
    v = diags("stream S = Reading\n    .where(value > 0.0)\n")
    assert no_errors(v), v.format()


def test_valid_let_declarations():
    v = diags('let x = 42\nlet y = "hello"\nlet z = true\n')
    assert no_errors(v), v.format()


def test_valid_var_declaration_and_assignment():
    v = diags('var x = 0\nx := x + 1\nvar y = "hello"\ny := y + " world"\n')
    assert no_errors(v), v.format()


def test_empty_program_is_valid():
    v = diags("")
    assert no_errors(v), v.format()


def test_format_includes_error_info():
    v = diags("event Foo:\n    x: int\nevent Foo:\n    y: float")
    formatted = v.format()
    assert formatted and ("error" in formatted or "E001" in formatted)


# -- the whole reference corpus stays error-free ---------------------------------


def test_reference_examples_validate_clean():
    """Every reference example and scenario program must pass validation
    with zero ERRORS (warnings allowed — implicit event types abound)."""
    import glob

    bad = []
    for f in sorted(
        glob.glob("/root/reference/examples/**/*.vpl", recursive=True)
        + glob.glob("/root/reference/tests/scenarios/*.vpl")
    ):
        with open(f) as fh:
            src = fh.read()
        try:
            import os

            prog = parse_full(src, base_path=os.path.dirname(f))
        except (SyntaxError, ValueError):
            continue  # parse coverage is pinned elsewhere
        v = validate(prog)
        if v.errors:
            bad.append((f, [d.format() for d in v.errors]))
    assert not bad, bad
