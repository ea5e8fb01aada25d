import sys

from fewbit_tpu.cli import main

sys.exit(main())
