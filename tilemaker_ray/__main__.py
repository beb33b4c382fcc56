import sys

from .pipelines.engine import main

sys.exit(main())
