import sys

from fft_restoration_tpu.cli import main

sys.exit(main())
