#!/bin/bash
for s in sparkmaster sparkworker1 sparkworker2 sparkworker3 sparkworker4 \
         sparkworker5 sparkworker6 sparkworker7 sparkworker8; do
  tmux kill-session -t "$s" 2>/dev/null || true
done
pkill -f "deploy.master.Master" 2>/dev/null || true
pkill -f "deploy.worker.Worker" 2>/dev/null || true
echo "cluster down"
