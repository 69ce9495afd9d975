"""Logger: writers, kv accumulation, profiling, greppable formats."""

import json
import pytest
import os

import numpy as np

from autodiffusion_tpu.utils import logger


class TestLogger:
    def test_configure_writes_files(self, tmp_path, capsys):
        lg = logger.configure(str(tmp_path), log_to_stdout=False)
        logger.log("epoch = 0")
        logger.log("No.1 [94, 217] fid = 17.86")
        logger.logkv("loss", 1.5)
        logger.logkv_mean("m", 1.0)
        logger.logkv_mean("m", 3.0)
        out = logger.dumpkvs()
        assert out["loss"] == 1.5
        assert out["m"] == 2.0

        txt = (tmp_path / "log.txt").read_text()
        assert "No.1 [94, 217] fid = 17.86" in txt   # greppable result format
        csv = (tmp_path / "progress.csv").read_text()
        assert "loss" in csv and "1.5" in csv
        j = json.loads((tmp_path / "progress.json").read_text().splitlines()[0])
        assert j["m"] == 2.0

    def test_csv_backfills_new_keys(self, tmp_path):
        logger.configure(str(tmp_path), log_to_stdout=False)
        logger.logkv("a", 1)
        logger.dumpkvs()
        logger.logkv("a", 2)
        logger.logkv("b", 3)
        logger.dumpkvs()
        lines = (tmp_path / "progress.csv").read_text().strip().splitlines()
        assert lines[0] == "a,b"
        assert lines[1].startswith("1")

    def test_profile_kv_accumulates(self, tmp_path):
        logger.configure(str(tmp_path), log_to_stdout=False)
        import time
        with logger.profile_kv("stage"):
            time.sleep(0.01)
        with logger.profile_kv("stage"):
            time.sleep(0.01)
        out = logger.dumpkvs()
        assert out["wait_stage"] >= 0.02

    def test_profile_decorator(self, tmp_path):
        logger.configure(str(tmp_path), log_to_stdout=False)

        @logger.profile("fn")
        def f():
            return 42

        assert f() == 42
        assert "wait_fn" in logger.dumpkvs()


class TestTensorBoardOutput:
    def test_tensorboard_format_writes_event_file(self, tmp_path):
        pytest.importorskip("torch.utils.tensorboard")
        import os

        from autodiffusion_tpu.utils import logger as lg
        lg.configure(str(tmp_path), log_to_stdout=False,
                     formats=["log", "tensorboard"])
        lg.logkv("step", 3)
        lg.logkv("loss", 1.25)
        lg.dumpkvs()
        tb_dir = tmp_path / "tb"
        assert tb_dir.is_dir()
        assert any(f.startswith("events.out.tfevents")
                   for f in os.listdir(tb_dir))
        lg.configure(None, log_to_stdout=False)  # reset global state

    def test_default_formats_unchanged(self, tmp_path):
        import os

        from autodiffusion_tpu.utils import logger as lg
        lg.configure(str(tmp_path), log_to_stdout=False)
        lg.logkv("a", 1)
        lg.dumpkvs()
        names = set(os.listdir(tmp_path))
        assert {"log.txt", "progress.csv", "progress.json"} <= names
        assert "tb" not in names
        lg.configure(None, log_to_stdout=False)
