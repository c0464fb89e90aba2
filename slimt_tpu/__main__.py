import sys

from slimt_tpu.cli import main

sys.exit(main())
