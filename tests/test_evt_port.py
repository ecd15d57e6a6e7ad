"""Port of the reference's event-file parser battery
(crates/varpulis-runtime/tests/event_extended_tests.rs): JSONL lines,
timing prefixes (incl. bare-ms), escape rules, positional events, strict
errors. The r8 port found the old parse_evt silently DROPPED JSONL lines,
bare-ms offsets, and malformed lines, and crashed on single-quoted
strings and unknown escapes — it is now a faithful event_file.rs port."""

import pytest

from varpulis_spark.sources.event_file import parse_evt


def one(src):
    (ev,) = parse_evt(src)
    return ev


# -- JSONL format (event_extended_tests.rs:121-178) ---------------------------


def test_parse_jsonl_line():
    off, etype, p = one('{"event_type": "Tick", "data": {"price": 100.5, "symbol": "AAPL"}}')
    assert etype == "Tick" and p == {"price": 100.5, "symbol": "AAPL"}


def test_parse_jsonl_with_null_and_bool():
    _, _, p = one('{"event_type": "X", "data": {"a": null, "b": true, "c": false}}')
    assert p == {"a": None, "b": True, "c": False}


def test_parse_jsonl_with_nested_array():
    _, _, p = one('{"event_type": "X", "data": {"arr": [1, 2, 3]}}')
    assert p["arr"] == [1, 2, 3]


def test_parse_jsonl_with_nested_object():
    _, _, p = one('{"event_type": "X", "data": {"inner": {"a": 1, "b": "hi"}}}')
    assert p["inner"] == {"a": 1, "b": "hi"}


def test_parse_jsonl_missing_event_type():
    with pytest.raises(ValueError, match="event_type"):
        parse_evt('{"data": {"x": 1}}')


def test_parse_jsonl_invalid_json():
    with pytest.raises(ValueError, match="Invalid JSON"):
        parse_evt("{not valid json}")


# -- timing prefixes (event_extended_tests.rs:184-224) ------------------------


def test_parse_timing_prefix_seconds():
    assert one("@5s Event { x: 1 }")[0] == 5.0


def test_parse_timing_prefix_milliseconds():
    assert one("@250ms Event { x: 1 }")[0] == 0.25


def test_parse_timing_prefix_minutes():
    assert one("@2m Event { x: 1 }")[0] == 120.0


def test_parse_timing_prefix_bare_number():
    # no unit = milliseconds (event_file.rs:165-169)
    assert one("@100 Event { x: 1 }")[0] == 0.1


def test_parse_timing_prefix_invalid():
    with pytest.raises(ValueError, match="Invalid timing value"):
        parse_evt("@abc Event { x: 1 }")


def test_parse_timing_prefix_no_space():
    with pytest.raises(ValueError, match="Invalid timing prefix"):
        parse_evt("@5s")


def test_parse_timing_prefix_rejects_decimal():
    # reference parses timing as u64 (event_file.rs:146-169) — no decimals
    with pytest.raises(ValueError, match="Invalid timing value"):
        parse_evt("@1.5s Event { x: 1 }")


def test_parse_timing_prefix_rejects_negative():
    with pytest.raises(ValueError, match="Invalid timing value"):
        parse_evt("@-100 Event { x: 1 }")


def test_parse_timing_prefix_rejects_hours_unit():
    # the reference only knows ms/s/m; '2h' falls through to the bare
    # u64 parse and errors
    with pytest.raises(ValueError, match="Invalid timing value"):
        parse_evt("@2h Event { x: 1 }")


def test_batch_rejects_non_u64():
    with pytest.raises(ValueError, match="Invalid BATCH time"):
        parse_evt("BATCH -5\nA { x: 1 }\n")


# -- evt lines ----------------------------------------------------------------


def test_parse_line_evt_format():
    _, etype, p = one("StockTick { price: 100.5 }")
    assert etype == "StockTick" and p == {"price": 100.5}


def test_parse_line_positional_format():
    _, etype, p = one('StockTick(100.5, "AAPL")')
    assert etype == "StockTick"
    assert p == {"field_0": 100.5, "field_1": "AAPL"}


def test_parse_line_bare_event_type_rejected():
    # neither '{' nor '(' → 'Invalid event format' (event_file.rs:179-187)
    with pytest.raises(ValueError, match="Invalid event format"):
        parse_evt("Heartbeat\n")


def test_parse_comments_and_batch():
    evs = parse_evt("# c\n// d\nBATCH 100\nA { x: 1 }\n")
    assert evs == [(0.1, "A", {"x": 1})]


# -- escape rules (event_extended_tests.rs:340-397) ---------------------------


def test_parse_string_with_tab_escape():
    assert "\t" in one(r'Ev { msg: "hello\tworld" }')[2]["msg"]


def test_parse_string_with_escaped_quote():
    assert '"' in one(r'Ev { msg: "say \"hello\"" }')[2]["msg"]


def test_parse_string_with_escaped_single_quote():
    assert "'" in one("Ev { msg: 'it\\'s fine' }")[2]["msg"]


def test_parse_string_with_unknown_escape():
    # unknown escapes kept verbatim (event_file.rs:333-336)
    assert "\\x" in one(r'Ev { msg: "hello\xworld" }')[2]["msg"]


def test_parse_string_with_trailing_backslash():
    assert len(parse_evt(r'Ev { msg: "trail\" }')) == 1


def test_parse_nested_braces_in_field_value():
    # the reference has NO map branch in .evt value position: `{...}`
    # falls through to the unquoted-string rule (event_file.rs:370-371)
    _, _, p = one('Ev { data: {a: 1, b: 2}, name: "x" }')
    assert p["data"] == "{a: 1, b: 2}" and p["name"] == "x"


def test_parse_empty_array():
    assert one("Ev { items: [] }")[2]["items"] == []


def test_parse_mixed_batch_and_timing():
    evs = parse_evt(
        "\nBATCH 50\nEvent1 { x: 1 }\n@100ms Event2 { y: 2 }\nEvent3 { z: 3 }\n"
    )
    assert [e[0] for e in evs] == [0.05, 0.1, 0.05]  # @-line, then batch again


def test_every_reference_scenario_still_parses():
    """The strict parser must accept the full reference corpus."""
    import glob

    files = glob.glob("/root/reference/**/*.evt", recursive=True)
    assert len(files) >= 20
    for f in files:
        with open(f) as fh:
            parse_evt(fh.read())
