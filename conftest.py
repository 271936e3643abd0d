"""Root conftest: put the repo on sys.path so `import pcompress_ray` works
without installation, for pytest and its Ray workers."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
