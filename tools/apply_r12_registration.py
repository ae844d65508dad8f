"""One-shot splice of the round-12 registrations into __spark_entry__.py.

Takes the first 50 staged names (stanza order) from
tools/r12_stanzas.generated.txt — the 8 leftovers (ivf_nprobe_sweep,
embedding_threshold_sweep, bpe_merge_curve, rfm_quintiles,
kneser_ney_trigram + the 3 special-wiring ops) carry to r13 per
PLANS.md — and inserts:

- the ``_q_<name>`` wrapper defs immediately before ``def queries()``;
- the queries() dict lines at the head of the dict (rotate_window.py
  --write re-sorts right after, pulling never-verified names first);
- the oracle_sql() dict lines, with bare generated module refs
  rewritten to the entry file's import idiom (top-level ``textops``/
  ``similarity``/``dedup``/``skew``/``windows``/``joins_mod``; lazy
  ``_mlprep_mod()``-style helpers for everything else).

Refuses to run twice (idempotence guard on the marker comment).
"""

from __future__ import annotations

import re
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
ENTRY = ROOT / "__spark_entry__.py"
STANZAS = ROOT / "tools" / "r12_stanzas.generated.txt"

N_REGISTER = 50
MARKER = "# --- round-12 registrations (staged round 11"

# generated bare module name -> expression valid inside oracle_sql()
LAZY = {
    "mlprep": "_mlprep_mod()",
    "timeseries": "_timeseries_mod()",
    "sketch": "_sketch_mod()",
    "graph": "_graph_mod()",
    "quality": "_quality_mod()",
}


def main() -> None:
    text = ENTRY.read_text()
    if MARKER in text:
        raise SystemExit("round-12 registrations already applied")
    src = STANZAS.read_text()

    wrap_m = re.search(r"# ---- _q_ wrappers -+\n(.*?)\n# ---- queries", src, re.S)
    q_m = re.search(r"# ---- queries\(\) entries -+\n(.*?)\n# ---- oracle", src, re.S)
    o_m = re.search(r"# ---- oracle_sql\(\) entries -+\n(.*)", src, re.S)

    q_lines = [ln for ln in q_m.group(1).splitlines() if ln.strip()]
    o_lines = [ln for ln in o_m.group(1).splitlines() if ln.strip()]
    names = [re.match(r'\s+"([a-z0-9_]+)":', ln).group(1) for ln in q_lines]
    assert len(names) == 58, len(names)
    register = names[:N_REGISTER]
    defer = names[N_REGISTER:]
    print(f"registering {len(register)}; deferring to r13: {defer}")

    # wrappers: split on blank-line-separated defs, keep those registering
    wrappers = re.split(r"\n\n\n", wrap_m.group(1).strip())
    keep = []
    for w in wrappers:
        name = re.match(r"def _q_([a-z0-9_]+)\(", w.strip()).group(1)
        if name in register:
            keep.append(w.strip())
    assert len(keep) == N_REGISTER, len(keep)

    q_keep = [ln for ln in q_lines if re.match(r'\s+"([a-z0-9_]+)"', ln).group(1) in register]
    o_keep = []
    for ln in o_lines:
        name = re.match(r'\s+"([a-z0-9_]+)"', ln).group(1)
        if name not in register:
            continue
        ln = re.sub(r"\s*# import operators\.\w+$", "", ln)
        mod = re.match(r'\s+"[a-z0-9_]+": (\w+)\.', ln).group(1)
        if mod in LAZY:
            ln = ln.replace(f": {mod}.", f": {LAZY[mod]}.", 1)
        o_keep.append(ln)
    assert len(q_keep) == len(o_keep) == N_REGISTER

    wrapper_block = "\n\n\n".join(keep) + "\n\n\n"
    text = text.replace(
        "def queries() -> dict",
        wrapper_block + "def queries() -> dict",
        1,
    )

    q_block = (
        "        " + MARKER + ", verified r12) ---\n" + "\n".join(q_keep) + "\n"
    )
    m = re.search(r"(def queries\(\).*?\n    return \{\n)", text, re.S)
    text = text[: m.end(1)] + q_block + text[m.end(1):]

    o_block = (
        "        # --- round-12 registrations ---\n" + "\n".join(o_keep) + "\n"
    )
    m = re.search(r"(def oracle_sql\(\).*?\n    return \{\n)", text, re.S)
    text = text[: m.end(1)] + o_block + text[m.end(1):]

    ENTRY.write_text(text)
    print(f"wrote {ENTRY}")


if __name__ == "__main__":
    main()
