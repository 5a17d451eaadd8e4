// WEASEL bag-layer golden: run the reference WEASEL.createWords +
// createBagOfPatterns + filterChiSquared on CBF and print per-sample bag
// contents and chi-squared survivors as JSON, keyed by CONTENT
// (unigram [0, windowIdx, maskedWord, count] / bigram
// [1, windowIdx, prevMasked, curMasked, count]) — the reference's
// dictionary ids are insertion-order (hazard H4), so ids are decoded
// back to content via WeaselDictAccess before emission.
import sfa.timeseries.TimeSeries;
import sfa.timeseries.TimeSeriesLoader;
import sfa.transformation.WEASEL;
import sfa.transformation.WeaselDictAccess;

import java.io.File;
import java.util.Arrays;
import java.util.HashMap;

public class GoldenGenWeasel {
    // Classifier.MAX_WINDOW_LENGTH = 250 -> binlog(highestOneBit(250))+1
    static final int HIGHEST_BIT = 8;

    // decode a dictionary long key: unigram = (word&mask)<<HB | w;
    // bigram = (prevId<<32 | curId) << HB  (ids >= 1 so v >= 2^32)
    static int[] decode(long key, HashMap<Integer, int[]> id2uni) {
        long v = key >>> HIGHEST_BIT;
        if (v < (1L << 32)) {
            int w = (int) (key & ((1L << HIGHEST_BIT) - 1));
            return new int[]{0, w, (int) v};
        }
        int prevId = (int) (v >>> 32);
        int curId = (int) v;
        int[] p = id2uni.get(prevId), c = id2uni.get(curId);
        if (p == null || c == null) throw new IllegalStateException("bigram of unknown unigram id");
        if (p[1] != c[1]) throw new IllegalStateException("bigram across window lengths");
        return new int[]{1, p[1], p[2], c[2]};
    }

    public static void main(String[] args) throws Exception {
        String fix = args[0];
        TimeSeries[] all = TimeSeriesLoader.loadDataset(new File(fix + "/CBF_TRAIN"));
        TimeSeries[] train = Arrays.copyOfRange(all, 0, 12);
        int maxF = 6, maxS = 4;
        int[] windows = {8, 16, 32};
        StringBuilder sb = new StringBuilder("{");
        boolean firstTop = true;
        for (boolean normMean : new boolean[]{true, false}) {
            WEASEL weasel = new WEASEL(maxF, maxS, windows, normMean, false);
            int[][][] words = weasel.createWords(train);
            for (int f = 4; f <= maxF; f += 2) {
                weasel.dict.reset();
                WEASEL.BagOfBigrams[] bags = weasel.createBagOfPatterns(words, train, f);
                // id -> content, in two passes (bigrams reference unigram ids)
                long[][] ents = WeaselDictAccess.entries(weasel.dict);
                HashMap<Integer, int[]> id2uni = new HashMap<>();
                for (long[] e : ents) {
                    long v = e[0] >>> HIGHEST_BIT;
                    if (v < (1L << 32)) {
                        id2uni.put((int) e[1], decode(e[0], null));
                    }
                }
                HashMap<Integer, int[]> id2content = new HashMap<>();
                for (long[] e : ents) {
                    id2content.put((int) e[1], decode(e[0], id2uni));
                }
                if (!firstTop) sb.append(",");
                firstTop = false;
                sb.append("\"weasel_norm").append(normMean).append("_f").append(f)
                  .append("\": {\"bags\": [");
                for (int j = 0; j < bags.length; j++) {
                    if (j > 0) sb.append(",");
                    sb.append("[");
                    int[][] ent = bags[j].bob.entries();
                    for (int i = 0; i < ent.length; i++) {
                        if (i > 0) sb.append(",");
                        int[] c = id2content.get(ent[i][0]);
                        sb.append(Arrays.toString(c), 0, Arrays.toString(c).length() - 1)
                          .append(", ").append(ent[i][1]).append("]");
                    }
                    sb.append("]");
                }
                sb.append("], \"chi\": [");
                weasel.filterChiSquared(bags, 2.0);
                int[][] chi = WeaselDictAccess.chiEntries(weasel.dict);
                for (int i = 0; i < chi.length; i++) {
                    if (i > 0) sb.append(",");
                    sb.append(Arrays.toString(id2content.get(chi[i][0])));
                }
                sb.append("]}");
            }
        }
        sb.append("}");
        System.out.println(sb.toString());
        System.exit(0); // ParallelFor pool threads are non-daemon
    }
}
