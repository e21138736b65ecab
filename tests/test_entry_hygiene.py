"""Entry-file hygiene: duplicate names silently clobber earlier oracles.

Two shadowing incidents this round (SQL_BENFORD constant, vocab_growth
dict key) motivated making the invariants a hard check: module-level
SQL constants must be unique, the queries()/oracle_sql() dict LITERALS
must not repeat a key (Python keeps only the last), and both dicts must
cover exactly the same names.
"""

from __future__ import annotations

import ast
import re

ENTRY = "/root/repo/__spark_entry__.py"


def _dict_literal_keys(func_name: str) -> list[str]:
    tree = ast.parse(open(ENTRY).read())
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == func_name:
            for n in ast.walk(node):
                if isinstance(n, ast.Dict):
                    return [
                        k.value for k in n.keys if isinstance(k, ast.Constant)
                    ]
    raise AssertionError(f"no dict literal found in {func_name}")


def test_sql_constants_unique():
    names = re.findall(r"^(SQL_[A-Z0-9_]+) = ", open(ENTRY).read(), re.M)
    dupes = sorted({n for n in names if names.count(n) > 1})
    assert not dupes, f"duplicate SQL constants shadow earlier oracles: {dupes}"


def test_query_dict_keys_unique_and_aligned():
    qk = _dict_literal_keys("queries")
    ok = _dict_literal_keys("oracle_sql")
    qd = sorted({k for k in qk if qk.count(k) > 1})
    od = sorted({k for k in ok if ok.count(k) > 1})
    assert not qd, f"duplicate queries() keys (last wins silently): {qd}"
    assert not od, f"duplicate oracle_sql() keys (last wins silently): {od}"
    assert set(qk) == set(ok), f"query/oracle mismatch: {set(qk) ^ set(ok)}"


def test_query_functions_unique():
    src = open(ENTRY).read()
    names = re.findall(r"^def (q_\w+)\(", src, re.M)
    dupes = sorted({n for n in names if names.count(n) > 1})
    assert not dupes, f"duplicate query functions shadow earlier ones: {dupes}"
