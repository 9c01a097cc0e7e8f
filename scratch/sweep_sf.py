"""Oracle sweep at an arbitrary scale factor: same compare as
drive_contract.py but parameterized — `python sweep_sf.py 0.1`.

The sf0.1 sweep (10x the driver's gate) is part of release checking: it
caught decimal->double ulp drift in money product sums that was invisible
at sf0.01 (see SCALE.md "Oracle float discipline")."""

import subprocess
import sys

sf = sys.argv[1] if len(sys.argv) > 1 else "0.1"
src = open("/root/repo/scratch/drive_contract.py").read().replace(
    "/root/testdata/sf0.01", f"/root/testdata/sf{sf}"
)
path = f"/tmp/drive_sf{sf}.py"
open(path, "w").write(src)
sys.exit(subprocess.call([sys.executable, path]))
