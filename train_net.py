"""Root-level training entry point (reference: train_net.py:33-132).

The reference ships the CLI twice — at the repo root and as a near-copy
under tools/ (SURVEY §2.1).  Here the root entry forwards to the single
implementation in tools/train.py, so both invocation styles work:

    python train_net.py --config_file configs/RGBNT201/DeMo.yml ...
    python tools/train.py --config_file configs/RGBNT201/DeMo.yml ...
"""

from tools.train import main

if __name__ == "__main__":
    main()
