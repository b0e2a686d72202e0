"""packet_rx — fixed Frame64 RX from an IQ file.

CLI re-creation of /root/reference/src/packet_rx.cc (framesync64 RX,
:190-243); shares the flexframe synchronizer (the Frame64 header still
carries the fixed props).
"""
from __future__ import annotations

import sys

from .flexframe_rx import main as _flex_main


def main(argv=None) -> int:
    return _flex_main(argv)


if __name__ == "__main__":
    sys.exit(main())
