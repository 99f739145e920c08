"""Command-line entry points mirroring the reference scripts.

python -m millieye_tpu.cli.train        (module*/train.py)
python -m millieye_tpu.cli.evaluate     (test_mixed / test_module2 /
                                         test_fusion)
python -m millieye_tpu.cli.demo         (run_sp.py / run_mp.py)
python -m millieye_tpu.cli.collect      (data_collection/collect.py)
python -m millieye_tpu.cli.prepare_data (data_collection/prepare_data.py)
"""
