// Golden generator: RUNS the reference SFA implementation (compiled in
// place from /root/reference) on the public CBF fixture and prints the
// exact words/bins as JSON. Output becomes tests/fixtures/ref_sfa_golden.json.
import sfa.timeseries.TimeSeries;
import sfa.timeseries.TimeSeriesLoader;
import sfa.transformation.SFA;

import java.io.File;

public class GoldenGen {
    static StringBuilder sb = new StringBuilder();

    static void words2d(short[][] words) {
        sb.append("[");
        for (int i = 0; i < words.length; i++) {
            if (i > 0) sb.append(",");
            words1d(words[i]);
        }
        sb.append("]");
    }

    static void words1d(short[] w) {
        sb.append("[");
        for (int j = 0; j < w.length; j++) {
            if (j > 0) sb.append(",");
            sb.append(w[j]);
        }
        sb.append("]");
    }

    static void bins(double[][] b) {
        sb.append("[");
        for (int i = 0; i < b.length; i++) {
            if (i > 0) sb.append(",");
            sb.append("[");
            for (int j = 0; j < b[i].length; j++) {
                if (j > 0) sb.append(",");
                double v = b[i][j];
                sb.append(v == Double.MAX_VALUE ? "\"inf\"" : Double.toString(v));
            }
            sb.append("]");
        }
        sb.append("]");
    }

    public static void main(String[] args) throws Exception {
        String fix = args[0];
        TimeSeries[] train = TimeSeriesLoader.loadDataset(new File(fix + "/CBF_TRAIN"));
        TimeSeries[] test = TimeSeriesLoader.loadDataset(new File(fix + "/CBF_TEST"));

        sb.append("{");
        // Config A — SFAWordsTest: whole-series fitTransform l=16 a=8 normMean=true
        for (boolean normMean : new boolean[]{true, false}) {
            SFA sfa = new SFA(SFA.HistogramType.EQUI_DEPTH);
            sfa.fitTransform(train, 16, 8, normMean);
            sb.append("\"whole_norm" + normMean + "\": {\"bins\": ");
            bins(sfa.bins);
            sb.append(", \"test_words\": [");
            for (int q = 0; q < test.length; q++) {
                if (q > 0) sb.append(",");
                words1d(sfa.transform(test[q]));
            }
            sb.append("]},");
        }
        // Config B — SFAWordsWindowingTest: fitWindowing w=64 l=4 a=4 normMean=true
        for (boolean normMean : new boolean[]{true, false}) {
            SFA sfa = new SFA(SFA.HistogramType.EQUI_DEPTH);
            sfa.fitWindowing(train, 64, 4, 4, normMean, true);
            sb.append("\"windowing_norm" + normMean + "\": {\"bins\": ");
            bins(sfa.bins);
            sb.append(", \"test_words\": [");
            int nq = Math.min(test.length, 20);
            for (int q = 0; q < nq; q++) {
                if (q > 0) sb.append(",");
                words2d(sfa.transformWindowing(test[q]));
            }
            sb.append("]}");
            sb.append(normMean ? "," : "");
        }
        sb.append("}");
        System.out.println(sb.toString());
    }
}
