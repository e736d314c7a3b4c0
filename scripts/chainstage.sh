#!/bin/bash
# Run a chip-using measurement-chain stage ("$@") in its own process
# group and record the pgid, so that bench.py (the driver-recorded
# benchmark) can SIGSTOP the whole stage — timeout wrapper, python,
# everything — while it measures on an otherwise-idle chip, then
# SIGCONT it. Round 2's driver bench ran concurrently with a training
# run and recorded a contaminated batched number (VERDICT r2 weak-#1);
# this is the mechanism that prevents a repeat.
setsid "$@" &
pid=$!
echo $pid > /tmp/hyres_chain_stage.pid
wait $pid
rc=$?
rm -f /tmp/hyres_chain_stage.pid
exit $rc
