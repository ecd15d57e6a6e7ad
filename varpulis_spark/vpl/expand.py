"""Compile-time expansion of top-level VPL declaration loops.

Reference semantics: crates/varpulis-parser/src/expand.rs — a *pre-parse
source transform*.  ``for VAR in START..END:`` at indent level 0 duplicates
its indented body once per integer value, substituting every ``{VAR}``
occurrence.  ``..=`` is the inclusive range.  The transform repeats until a
fixed point so nested top-level loops expand too (inner loops land at
indent 0 after the outer pass strips one indent level).

Caps (expand.rs:1-4): 10_000 iterations per loop, 10 expansion passes.
Loops *inside* declarations (indent > 0 under an ``fn``, say) are left
alone — those are runtime for loops, not metaprogramming.
"""

from __future__ import annotations

import os
import re

MAX_LOOP_ITERATIONS = 10_000
MAX_EXPANSION_PASSES = 10

_FOR_RE = re.compile(r"^for\s+([A-Za-z_]\w*)\s+in\s+(-?\d+)\s*\.\.(=?)\s*(-?\d+)\s*:$")


def _parse_for_header(trimmed: str) -> tuple[str, int, int] | None:
    """``for VAR in START..END:`` / ``..=END:`` -> (var, start, end_excl)."""
    m = _FOR_RE.match(trimmed)
    if not m:
        return None
    var, start, inclusive, end = m.group(1), int(m.group(2)), m.group(3), int(m.group(4))
    return var, start, end + 1 if inclusive else end


def _indent_of(line: str) -> int:
    return len(line) - len(line.lstrip())


def _expand_one_pass(source: str) -> str:
    lines = source.split("\n")
    if lines and lines[-1] == "":
        lines.pop()  # Rust .lines() drops the trailing empty segment
    out: list[str] = []
    i = 0
    while i < len(lines):
        line = lines[i]
        trimmed = line.strip()
        if _indent_of(line) == 0 and trimmed.startswith("for ") and trimmed.endswith(":"):
            hdr = _parse_for_header(trimmed)
            if hdr is not None:
                var, start, end = hdr
                if end - start > MAX_LOOP_ITERATIONS:
                    raise SyntaxError(
                        f"VPL declaration loop range too large: {start}..{end} "
                        f"({end - start} iterations, max {MAX_LOOP_ITERATIONS})"
                    )
                # body: following lines with indent > 0 (blank lines included)
                # until the next indent-0 line
                body_start = i + 1
                body_end = body_start
                body_indent: int | None = None
                while body_end < len(lines):
                    bl = lines[body_end]
                    if not bl.strip():
                        body_end += 1
                        continue
                    bi = _indent_of(bl)
                    if bi == 0:
                        break
                    if body_indent is None:
                        body_indent = bi
                    body_end += 1
                strip = body_indent if body_indent is not None else 4
                pattern = "{%s}" % var
                for val in range(start, end):
                    for bl in lines[body_start:body_end]:
                        if not bl.strip():
                            out.append("")
                            continue
                        stripped = bl[strip:] if len(bl) >= strip else bl.lstrip()
                        out.append(stripped.replace(pattern, str(val)))
                i = body_end
                continue
        out.append(line)
        i += 1
    return "\n".join(out) + "\n"


def expand_declaration_loops(source: str) -> str:
    """Run expansion passes to a fixed point (max 10, expand.rs:20-27)."""
    result = source
    for _ in range(MAX_EXPANSION_PASSES):
        expanded = _expand_one_pass(result)
        if expanded == result:
            return result
        result = expanded
    # one more probe: if still not at a fixed point, the program demanded
    # more than MAX_EXPANSION_PASSES rounds of nesting
    if _expand_one_pass(result) != result:
        raise SyntaxError(
            f"VPL declaration-loop expansion limit exceeded: more than "
            f"{MAX_EXPANSION_PASSES} passes required"
        )
    return result


# ---------------------------------------------------------------------------
# import resolution (varpulis-cli/src/main.rs:2991-3090)
# ---------------------------------------------------------------------------

MAX_IMPORT_DEPTH = 10


def resolve_import_file(
    path: str,
    base_path: str | None,
    depth: int,
    visited: set[str],
):
    """Load + parse one imported ``.vpl`` file, recursively resolving its
    own imports.  Returns the parsed ``Program`` (or ``None`` when the
    canonical path was already imported — cycle/diamond guard, matching the
    reference's visited-set skip, main.rs:3039-3046)."""
    from . import parser as _parser  # local import to avoid a cycle

    if depth > MAX_IMPORT_DEPTH:
        raise SyntaxError(
            f"VPL import depth limit exceeded (max {MAX_IMPORT_DEPTH}); "
            "check for circular imports"
        )
    full = os.path.join(base_path, path) if base_path else path
    canonical = os.path.realpath(full)
    if canonical in visited:
        return None
    visited.add(canonical)
    try:
        with open(full, "r", encoding="utf-8") as fh:
            src = fh.read()
    except OSError as e:
        raise SyntaxError(f"failed to read VPL import '{full}': {e}") from e
    return _parser.parse_full(
        src,
        base_path=os.path.dirname(full) or ".",
        _depth=depth,
        _visited=visited,
    )
