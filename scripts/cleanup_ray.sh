#!/bin/bash
# Kill orphaned Ray processes from killed runs. Safe to run anytime:
# patterns live in this file, not the caller's command line.
for pat in default_worker.py raylet gcs_server dashboard/agent runtime_env/agent log_monitor; do
    pgrep -f "$pat" | while read -r pid; do
        [ "$pid" != "$$" ] && kill -9 "$pid" 2>/dev/null
    done
done
sleep 1
rm -rf /tmp/ray
echo "ray state cleaned"
