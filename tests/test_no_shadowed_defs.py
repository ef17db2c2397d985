"""No silently-shadowed catalog code (VERDICT r11 "What's wrong" #2).

Round 11 shipped a duplicate top-level ``q_user_retention_cohorts`` (a
daily-cohort definition silently overwritten ~1300 lines later by the
weekly one, plus duplicated dict keys in EXTRA_QUERIES/EXTRA_ORACLES).
Python makes the last definition win without a whisper, so an edit to
the dead first definition would change nothing and still "pass".  These
tests parse each plans module's AST and fail on any duplicate top-level
def / assignment target / literal dict key, so a shadowed catalog entry
can never sit silently again.  Pure AST — no SparkSession.
"""

import ast
import collections
import os

import pytest

import graphdb_for_drones_spark.plans.curation_queries
import graphdb_for_drones_spark.plans.extra_queries
import graphdb_for_drones_spark.plans.llm_queries
import graphdb_for_drones_spark.plans.queries

PLANS_MODULES = [
    graphdb_for_drones_spark.plans.queries,
    graphdb_for_drones_spark.plans.llm_queries,
    graphdb_for_drones_spark.plans.extra_queries,
    graphdb_for_drones_spark.plans.curation_queries,
]


def _module_tree(mod):
    with open(mod.__file__) as fh:
        return ast.parse(fh.read(), filename=mod.__file__)


@pytest.mark.parametrize(
    "mod", PLANS_MODULES, ids=lambda m: m.__name__.rsplit(".", 1)[-1]
)
def test_no_duplicate_toplevel_names(mod):
    """A module-level def or simple assignment target must appear ONCE:
    a second occurrence shadows the first into dead code."""
    tree = _module_tree(mod)
    seen = collections.defaultdict(list)
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            seen[node.name].append(node.lineno)
        elif isinstance(node, ast.Assign):
            for tgt in node.targets:
                if isinstance(tgt, ast.Name):
                    seen[tgt.id].append(node.lineno)
        # AugAssign / annotated assigns are accumulation idioms, not
        # shadowing — exempt by omission.
    dupes = {n: lines for n, lines in seen.items() if len(lines) > 1}
    assert not dupes, (
        f"{os.path.basename(mod.__file__)} defines these top-level names "
        f"more than once (earlier ones are silently dead): {dupes}"
    )


@pytest.mark.parametrize(
    "mod", PLANS_MODULES, ids=lambda m: m.__name__.rsplit(".", 1)[-1]
)
def test_no_duplicate_dict_literal_keys(mod):
    """Constant keys inside any module-level dict literal (the
    QUERIES/ORACLES registries) must be unique: Python keeps only the
    last value, so a duplicate key is an invisible unregistration."""
    tree = _module_tree(mod)
    problems = {}
    for node in ast.walk(tree):
        if not isinstance(node, ast.Dict):
            continue
        keys = [
            k.value
            for k in node.keys
            if isinstance(k, ast.Constant) and isinstance(k.value, str)
        ]
        dupes = [k for k, n in collections.Counter(keys).items() if n > 1]
        if dupes:
            problems[f"dict at line {node.lineno}"] = dupes
    assert not problems, (
        f"{os.path.basename(mod.__file__)} has dict literals with "
        f"duplicate string keys (earlier entries silently dropped): "
        f"{problems}"
    )
