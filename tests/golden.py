"""Golden-VCF comparison harness for application tests.

Runs a program's run_stdout into a buffer and compares line-by-line
against a checked-in reference VCF; ##commandline/##source/##fileDate
lines are compared loosely (same regime as the reference's application
tests, e.g. test_application_call_exact.py:188-213).
"""

import contextlib
import io
import pathlib

DATA = pathlib.Path("/root/reference/mchap/tests/test_io/data")


def data_path(name):
    return str(DATA / name)


def run_stdout_lines(prog):
    buffer = io.StringIO()
    with contextlib.redirect_stdout(buffer):
        prog.run_stdout()
    return buffer.getvalue().splitlines(keepends=True)


def assert_vcf_equal(actual_lines, golden_name, skip_exact_lines=()):
    with open(data_path(golden_name)) as f:
        expected = f.readlines()
    assert len(actual_lines) == len(expected), (
        f"line count {len(actual_lines)} != {len(expected)}"
    )
    for i, (act, exp) in enumerate(zip(actual_lines, expected)):
        if act.startswith("##commandline"):
            assert exp.startswith("##commandline")
        elif act.startswith("##source=mchap"):
            assert exp.startswith("##source=mchap")
        elif act.startswith("##fileDate"):
            assert exp.startswith("##fileDate")
        elif any(act.startswith(prefix) for prefix in skip_exact_lines):
            pass
        else:
            assert act == exp, f"line {i + 1} differs:\n got: {act} want: {exp}"
