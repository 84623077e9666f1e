"""Tests for the progress table."""

from scptoolbox_tpu.utils.table import Column, Table, improvement_percent


def test_table_prints_header_once_and_rows():
    lines = []
    tbl = Table(
        [
            Column("iter", "k", "%d"),
            Column("cost", "J", "%.2e"),
            Column("extra", "x", "%.1f"),
        ],
        print_fn=lines.append,
    )
    tbl.print_row({"iter": 1, "cost": 3.0})
    tbl.print_row({"iter": 2, "cost": 1.5, "extra": 0.25})
    # header block + 2 rows
    assert len(lines) == 3
    assert "k" in lines[0] and "J" in lines[0]
    assert "1" in lines[1] and "3.00e" in lines[1]
    assert "0.2" in lines[2]
    tbl.reset()
    tbl.print_row({"iter": 3, "cost": 1.0})
    assert len(lines) == 5  # header reprinted


def test_improvement_percent():
    assert improvement_percent(10.0, 9.0) == 10.0
    assert improvement_percent(-10.0, -11.0) == 10.0
