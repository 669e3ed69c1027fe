"""A/B the on-TPU pallas-vs-xla numerics with the ALIGNED binning layout
to isolate whether probe_compact_tpu's diff magnitude is the compact layout
or pre-existing TPU precision spread. Both probes now drive
rasterize_pallas_full(layout=...) directly (ADVICE r04: the old monkeypatch
targeted a name render.py no longer imports and was a silent no-op)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import probe_compact_tpu

if __name__ == "__main__":
    probe_compact_tpu.main(layout="aligned")
