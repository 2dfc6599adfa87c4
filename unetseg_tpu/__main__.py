import sys

from unetseg_tpu.cli import main

sys.exit(main())
