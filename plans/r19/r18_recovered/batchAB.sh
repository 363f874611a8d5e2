#!/bin/bash
B=/tmp/classes_before
A=/root/repo/target/scala-2.13/classes
for q in sim_pairs_threshold_scaled sim_ann_lsh_scaled emb_hard_negatives; do
  /tmp/leg.sh $B /root/testdata/sf0.1 3 32 "sf0.1-before" $q
  /tmp/leg.sh $A /root/testdata/sf0.1 3 32 "sf0.1-after " $q
done
for q in sim_pairs_threshold_scaled sim_ann_lsh_scaled emb_hard_negatives; do
  /tmp/leg.sh $B /tmp/sf1 2 32 "sf1-before" $q
  /tmp/leg.sh $A /tmp/sf1 2 32 "sf1-after " $q
done
echo BATCH_AB_DONE
