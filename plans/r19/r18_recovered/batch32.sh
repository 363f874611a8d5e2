#!/bin/bash
B=/tmp/classes_before
A=/root/repo/target/scala-2.13/classes
for i in 1 2; do
  /tmp/leg.sh $B /tmp/sf32x 1 32 "32x-r$i-before" sim_pairs_threshold_scaled
  /tmp/leg.sh $A /tmp/sf32x 1 32 "32x-r$i-after " sim_pairs_threshold_scaled
done
echo B32_DONE
