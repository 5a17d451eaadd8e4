// MUSE bag-layer golden: run the reference MUSE.createWords +
// createBagOfPatterns + filterChiSquared on ShapesRandom (with derivative
// channels, as MTSClassificationTest does) and print per-sample bag
// contents and chi-squared survivors as JSON, keyed by CONTENT — the
// MuseWord struct (windowIdx, dim, maskedWord, maskedWord2) with
// word2=0 for unigrams (NOTE: the reference's MuseWord equality makes a
// bigram whose second word masks to 0 COLLIDE with the unigram of its
// first word — content keys preserve that semantics verbatim).
import sfa.timeseries.MultiVariateTimeSeries;
import sfa.timeseries.TimeSeriesLoader;
import sfa.transformation.MUSE;
import sfa.transformation.MuseDictAccess;
import sfa.transformation.SFA;

import java.io.File;
import java.util.Arrays;
import java.util.HashMap;

public class GoldenGenMuse {
    public static void main(String[] args) throws Exception {
        String fix = args[0];
        MultiVariateTimeSeries[] train = TimeSeriesLoader.loadMultivariateDatset(
            new File(fix + "/ShapesRandom_TRAIN3"), true);
        int maxF = 6, maxS = 4;
        int[] windows = {8, 16};
        int dims = train[0].getDimensions();
        StringBuilder sb = new StringBuilder("{");
        boolean firstTop = true;
        for (SFA.HistogramType hist : new SFA.HistogramType[]{
                SFA.HistogramType.EQUI_DEPTH, SFA.HistogramType.EQUI_FREQUENCY}) {
            for (boolean normMean : new boolean[]{true, false}) {
                MUSE muse = new MUSE(maxF, maxS, hist, windows, normMean, true);
                int[][][] words = muse.createWords(train);
                // raw per-(window, sample*dim, offset) packed words — lets
                // the parity test validate the bag/chi layer EXACTLY from
                // the reference's own words, independent of FFT float noise
                if (!firstTop) sb.append(",");
                firstTop = false;
                sb.append("\"muse_").append(hist).append("_norm").append(normMean)
                  .append("_words\": [");
                for (int w = 0; w < words.length; w++) {
                    if (w > 0) sb.append(",");
                    sb.append("[");
                    for (int s = 0; s < words[w].length; s++) {
                        if (s > 0) sb.append(",");
                        sb.append(Arrays.toString(words[w][s]));
                    }
                    sb.append("]");
                }
                sb.append("]");
                for (int f = 4; f <= maxF; f += 2) {
                    muse.dict.reset();
                    MUSE.BagOfBigrams[] bags =
                        muse.createBagOfPatterns(words, train, dims, f);
                    int[][] ents = MuseDictAccess.entries(muse.dict);
                    HashMap<Integer, int[]> id2content = new HashMap<>();
                    for (int[] e : ents) {
                        id2content.put(e[4], new int[]{e[0], e[1], e[2], e[3]});
                    }
                    if (!firstTop) sb.append(",");
                    firstTop = false;
                    sb.append("\"muse_").append(hist).append("_norm").append(normMean)
                      .append("_f").append(f).append("\": {\"bags\": [");
                    for (int j = 0; j < bags.length; j++) {
                        if (j > 0) sb.append(",");
                        sb.append("[");
                        int[][] ent = bags[j].bob.entries();
                        for (int i = 0; i < ent.length; i++) {
                            if (i > 0) sb.append(",");
                            int[] c = id2content.get(ent[i][0]);
                            sb.append("[").append(c[0]).append(",").append(c[1])
                              .append(",").append(c[2]).append(",").append(c[3])
                              .append(",").append(ent[i][1]).append("]");
                        }
                        sb.append("]");
                    }
                    sb.append("], \"chi\": [");
                    muse.filterChiSquared(bags, 2.0);
                    int[][] chi = MuseDictAccess.chiEntries(muse.dict);
                    for (int i = 0; i < chi.length; i++) {
                        if (i > 0) sb.append(",");
                        int[] c = id2content.get(chi[i][0]);
                        sb.append("[").append(c[0]).append(",").append(c[1])
                          .append(",").append(c[2]).append(",").append(c[3]).append("]");
                    }
                    sb.append("]}");
                }
            }
        }
        sb.append("}");
        System.out.println(sb.toString());
        System.exit(0); // ParallelFor pool threads are non-daemon
    }
}
