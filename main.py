"""Entry point with the reference's CLI surface (ref main.py).

Usage mirrors the reference:
    python main.py --phase train --dataset <name> --img_size 128 ...
    python main.py --phase test  --dataset <name> --img_size 128 ...
"""

import sys

from biggan_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
