"""TPU tunnel watcher: probe the axon relay ports until the tunnel is
back, then fire the queued TPU job script exactly once.

The tunnel daemon (a stdio relay on localhost ports 8082...) dies
occasionally and cannot be restarted from inside the VM; jax.devices()
then hangs forever. This watcher polls with cheap socket connects, and
on success double-checks with a subprocess `jax.devices()` (bounded by a
timeout) before launching the job queue.

Usage:  python scripts/tpu_watch.py [jobs_script] &
Writes /tmp/tpu_watch.log; touches /tmp/TPU_UP when the tunnel verifies.
"""

import os
import socket
import subprocess
import sys
import time

PORTS = (8082, 8083, 8087)
LOG = "/tmp/tpu_watch.log"


def log(msg):
    line = "[%s] %s\n" % (time.strftime("%H:%M:%S"), msg)
    with open(LOG, "a") as f:
        f.write(line)
    sys.stderr.write(line)


def ports_open():
    for p in PORTS:
        s = socket.socket()
        s.settimeout(2)
        try:
            s.connect(("127.0.0.1", p))
        except OSError:
            return False
        finally:
            s.close()
    return True


def jax_alive(timeout=150):
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices())"],
            timeout=timeout, capture_output=True, text=True,
        )
        return r.returncode == 0 and "tpu" in (r.stdout + r.stderr).lower()
    except subprocess.TimeoutExpired:
        return False


def main():
    jobs = sys.argv[1] if len(sys.argv) > 1 else None
    log("watcher start (jobs=%s)" % jobs)
    while True:
        if ports_open():
            log("relay ports open; verifying jax device init...")
            if jax_alive():
                log("TPU tunnel UP")
                with open("/tmp/TPU_UP", "w") as f:
                    f.write(time.strftime("%F %T"))
                if jobs and os.path.exists(jobs):
                    log("running job queue: %s" % jobs)
                    rc = subprocess.call(["bash", jobs])
                    log("job queue finished rc=%d" % rc)
                    if rc != 0:
                        # mid-queue tunnel death: completed jobs left
                        # their outputs, the script skips them on rerun —
                        # go back to waiting and retry the rest
                        log("requeueing unfinished jobs")
                        time.sleep(120)
                        continue
                return
            log("ports open but jax init failed; retrying in 120 s")
        time.sleep(120)


if __name__ == "__main__":
    main()
