"""The unified maintenance exit-code contract (r9 VERDICT ask #7):
one matrix across maintain / skew-check / explain-join / profile-diff
so cron consumers can branch on $? without parsing JSON. The per-code
BEHAVIORS are pinned where each command is tested (test_joinplan's
explain-join exit 3, test_cli's skew-check/profile-diff flows); this
file pins the matrix itself and that no raise site bypasses it."""

from __future__ import annotations

import inspect
import re

from yelp_recommender_spark import cli


def test_exit_code_matrix_is_pinned():
    assert cli.EXIT_CODES == {
        "ok": 0,
        "usage": 1,
        "check_failed": 2,
        "verdict": 3,
        "drift": 4,
    }
    assert cli.EXIT_OK == 0
    assert cli.EXIT_USAGE == 1
    assert cli.EXIT_CHECK_FAILED == 2
    assert cli.EXIT_VERDICT == 3
    assert cli.EXIT_DRIFT == 4


def test_help_epilog_documents_every_code():
    for token in (
        "exit codes",
        "skew-check",
        "explain-join",
        "profile-diff",
        "--check-index",
    ):
        assert token in cli._EXIT_EPILOG, token
    # every nonzero code appears in the documented matrix
    for code in ("1", "2", "3", "4"):
        assert re.search(rf"\b{code}\b", cli._EXIT_EPILOG), code


def test_no_raise_site_bypasses_the_named_constants():
    """Every numeric SystemExit in the CLI goes through the named
    constants — a new subcommand inventing its own code fails here,
    not in a cron job six months later. Message-only SystemExits
    (exit 1, usage/config errors) remain allowed."""
    src = inspect.getsource(cli)
    bare = re.findall(r"SystemExit\((\d+)\)", src)
    assert bare == [], f"bare numeric exit codes: {bare}"
