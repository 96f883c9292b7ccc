"""Registry-integrity gates: QUERIES/ORACLES parity and the rotation
policy (every entry driver-audited within the policy bound) checked
mechanically against the committed CORRECTNESS_r*.json audit trail."""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)


def test_queries_oracles_key_parity():
    from cli_p_spark.plans.contract import ORACLES, QUERIES

    assert set(QUERIES) == set(ORACLES)
    assert len(QUERIES) == len(ORACLES)


def test_rotation_policy_holds():
    import check_rotation

    problems = check_rotation.check()
    assert not problems, "\n".join(problems)


def test_slipped_entries_untouched_is_checkable():
    """Every slipped entry must still exist in the registry (a rename or
    delete would silently void the slip documentation)."""
    import check_rotation

    from cli_p_spark.plans.contract import QUERIES

    names = list(QUERIES)
    for name in check_rotation.SLIPPED:
        assert name in names, name
        assert names.index(name) >= check_rotation.WINDOW, (
            f"{name} is documented as slipped but sits inside the window"
        )
