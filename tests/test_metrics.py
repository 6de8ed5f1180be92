"""Training observability: CSV + TensorBoard scalar stream (utils/metrics.py).

The reference logs to TensorBoard via SB3 (ppo_train.py:92).  The writer here
encodes TFRecord framing + Event protos by hand; the official tensorboard
reader is used as the oracle for well-formedness.
"""

import csv

import numpy as np
import pytest

from smart_nanogrid_gym_tpu.utils.metrics import MetricsWriter, _crc32c


def test_crc32c_known_vectors():
    # RFC 3720 test vectors
    assert _crc32c(b"") == 0
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(bytes(32)) == 0x8A9136AA


def test_csv_stream(tmp_path):
    with MetricsWriter(str(tmp_path)) as w:
        w.add(10, loss=0.5, reward=-100.0)
        w.add(20, loss=0.25, reward=-50.0)
        with pytest.raises(ValueError, match="new metric"):
            w.add(30, other=1.0)
    rows = list(csv.DictReader(open(tmp_path / "progress.csv")))
    assert [r["step"] for r in rows] == ["10", "20"]
    assert float(rows[1]["loss"]) == 0.25


def test_tensorboard_reader_parses_events(tmp_path):
    pytest.importorskip("tensorboard")
    from tensorboard.backend.event_processing import event_accumulator

    with MetricsWriter(str(tmp_path), run_name="run1") as w:
        for i in range(5):
            w.add(i * 100, mean_day_return=-300.0 + i, policy_loss=0.1 / (i + 1))

    acc = event_accumulator.EventAccumulator(str(tmp_path / "run1"))
    acc.Reload()
    tags = set(acc.Tags()["scalars"])
    assert tags == {"mean_day_return", "policy_loss"}
    events = acc.Scalars("mean_day_return")
    assert [e.step for e in events] == [0, 100, 200, 300, 400]
    np.testing.assert_allclose(
        [e.value for e in events], [-300.0 + i for i in range(5)], rtol=1e-6
    )


def test_train_ppo_cli_writes_metrics(tmp_path):
    from smart_nanogrid_gym_tpu.tools.train_ppo import main

    main([
        "--variant", "basic", "--num-chargers", "2", "--batch", "16",
        "--epochs", "2", "--episodes-per-epoch", "16",
        "--models-dir", str(tmp_path), "--log-dir", str(tmp_path / "logs"),
    ])
    assert (tmp_path / "logs" / "progress.csv").exists()
    assert list((tmp_path / "logs").glob("events.out.tfevents.*"))


def test_csv_resume_same_schema_appends_without_duplicate_header(tmp_path):
    with MetricsWriter(str(tmp_path)) as w:
        w.add(10, loss=0.5)
    # a resumed run with the SAME metric set appends rows under the one header
    with MetricsWriter(str(tmp_path)) as w:
        w.add(20, loss=0.25)
    text = (tmp_path / "progress.csv").read_text()
    assert text.count("step,loss") == 1
    rows = list(csv.DictReader(open(tmp_path / "progress.csv")))
    assert [r["step"] for r in rows] == ["10", "20"]
    assert float(rows[1]["loss"]) == 0.25


def test_csv_resume_schema_mismatch_raises(tmp_path):
    with MetricsWriter(str(tmp_path)) as w:
        w.add(10, loss=0.5)
    # resuming into an existing file with a DIFFERENT metric set must fail
    # loudly instead of writing misaligned rows under the old header
    w = MetricsWriter(str(tmp_path))
    try:
        with pytest.raises(ValueError, match="header"):
            w.add(20, reward=-1.0)
    finally:
        w.close()
    rows = list(csv.DictReader(open(tmp_path / "progress.csv")))
    assert [r["step"] for r in rows] == ["10"]  # nothing misaligned was written
