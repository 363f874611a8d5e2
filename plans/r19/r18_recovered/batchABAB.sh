#!/bin/bash
B=/tmp/classes_before
A=/root/repo/target/scala-2.13/classes
for i in 1 2 3; do
  /tmp/leg.sh $B /tmp/sf1 2 32 "r$i-before" sim_pairs_threshold_scaled
  /tmp/leg.sh $A /tmp/sf1 2 32 "r$i-after " sim_pairs_threshold_scaled
done
echo ABAB_DONE
