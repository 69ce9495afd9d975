"""Logger: writers, kv accumulation, profiling, greppable formats."""

import json
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
