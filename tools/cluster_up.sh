#!/bin/bash
# Start a local Spark standalone cluster: 1 master + 4 workers (2 cores, 6g
# each), each in its own tmux session so they survive the launching shell.
# Usage: tools/cluster_up.sh [n_workers]   /  tools/cluster_down.sh
set -e
N=${1:-4}
mkdir -p /tmp/spark-logs
tmux kill-session -t sparkmaster 2>/dev/null || true
tmux new-session -d -s sparkmaster \
  "/opt/spark/bin/spark-class org.apache.spark.deploy.master.Master \
   --host 127.0.0.1 --port 7077 --webui-port 8090 2>&1 | tee /tmp/spark-logs/master.log"
sleep 8
for i in $(seq 1 "$N"); do
  tmux kill-session -t "sparkworker$i" 2>/dev/null || true
  tmux new-session -d -s "sparkworker$i" \
    "/opt/spark/bin/spark-class org.apache.spark.deploy.worker.Worker \
     spark://127.0.0.1:7077 --cores 2 --memory 6g --webui-port $((8100+i)) \
     2>&1 | tee /tmp/spark-logs/worker$i.log"
done
sleep 10
echo "registered workers: $(grep -c 'Registering worker' /tmp/spark-logs/master.log)"
