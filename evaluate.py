#!/usr/bin/env python
"""Root shim: `python evaluate.py --single ... --multi ...` (reference evaluate.py
workflow). See self_play_racing_tpu/evaluate.py for the implementation."""
from self_play_racing_tpu.evaluate import main

if __name__ == "__main__":
    main()
