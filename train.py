#!/usr/bin/env python
"""Root shim: `python train.py multi|single|sb3|all` (reference train.py workflow).
See self_play_racing_tpu/train.py for the implementation."""
from self_play_racing_tpu.train import main

if __name__ == "__main__":
    main()
